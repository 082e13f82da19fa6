"""Fused Pallas TPU kernel: whole Langevin trajectories in VMEM.

The XLA integrator round-trips walker state and (B, n, n) nonbonded
intermediates through HBM every step.  This kernel keeps positions and
velocities of a walker block in VMEM for the entire trajectory:

- layout: rows = coordinates (3N padded to sublanes), lanes = walkers;
- ALL force terms run over *difference vectors* produced by ONE dense
  difference-operator matmul ``D @ X`` (nonbonded pair rows + bond rows +
  angle u/v rows + dihedral b1/b2/b3 rows, grouped by x/y/z component) and
  forces return through the transposed matmul ``F = -D^T dE/d(diff)`` —
  two MXU matmuls per step, zero gathers/scatters;
- analytic per-term gradients w.r.t. the difference vectors (validated
  against jax.grad of the XLA energy in the test-suite);
- noise from the TPU hardware PRNG (pltpu.prng_random_bits + Box-Muller).

Supports the NoCutoff / reaction-field systems of the reference
workloads (no GBSA inside the kernel yet).  ``aboba_girsanov_fused``
additionally evaluates the optcontrol chi-MLP bias *inside* the kernel
(the pair rows double as the model features) and accumulates the
Girsanov log-weights — biased sampling at kernel speed (measured 1.9x
the XLA ABOBA path on v5e at 1024 walkers; E[w]=1 martingale validated).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from .system import MDSystem, COULOMB
from .integrators import KB, PSI_FLOOR


def _round_up(x, m):
    return ((x + m - 1) // m) * m


class PallasMDPlan:
    """Precomputed static data for the fused kernel (host-side numpy)."""

    def __init__(self, sys: MDSystem):
        natoms = sys.natoms
        A3 = 3 * natoms
        self.A3 = A3
        self.R3 = _round_up(A3, 8)            # padded coordinate rows

        bond_idx = np.asarray(sys.bond_idx).reshape(-1, 2)
        angle_idx = np.asarray(sys.angle_idx).reshape(-1, 3)
        dih_idx = np.asarray(sys.dih_idx).reshape(-1, 4)
        iu, ju = np.triu_indices(natoms, k=1)

        # difference rows (a, b): d = x_a - x_b, grouped contiguously
        rows = []

        def add(pairs):
            start = len(rows)
            rows.extend(pairs)
            return slice(start, len(rows))

        self.sl_pairs = add(list(zip(iu.tolist(), ju.tolist())))
        self.sl_bonds = add([(int(a), int(b)) for a, b in bond_idx])
        self.sl_ang_u = add([(int(a), int(b)) for a, b, c in angle_idx])
        self.sl_ang_v = add([(int(c), int(b)) for a, b, c in angle_idx])
        self.sl_b1 = add([(int(j), int(i)) for i, j, k, l in dih_idx])
        self.sl_b2 = add([(int(k), int(j)) for i, j, k, l in dih_idx])
        self.sl_b3 = add([(int(l), int(k)) for i, j, k, l in dih_idx])

        self.nrows = len(rows)
        self.NR = _round_up(self.nrows, 8)    # padded diff rows per component

        D = np.zeros((3 * self.NR, self.R3), np.float32)
        for r, (a, b) in enumerate(rows):
            for c in range(3):
                D[c * self.NR + r, 3 * a + c] += 1.0
                D[c * self.NR + r, 3 * b + c] -= 1.0
        self.D = D
        self.DT = np.ascontiguousarray(D.T)

        def col(v, n=None, fill=0.0):
            v = np.asarray(v, np.float32).ravel()
            n = len(v) if n is None else n
            out = np.full((n, 1), fill, np.float32)
            out[:len(v), 0] = v
            return out

        q = np.asarray(sys.charges)
        rmh = np.asarray(sys.rmin_half)
        eps = np.asarray(sys.eps)
        qqs = np.asarray(sys.qq_scale)
        ljs = np.asarray(sys.lj_scale)
        self.nb_qq = col(COULOMB * q[iu] * q[ju] * qqs[iu, ju])
        self.nb_eps = col(np.sqrt(eps[iu] * eps[ju]) * ljs[iu, ju])
        self.nb_rmin = col(rmh[iu] + rmh[ju], fill=1.0)
        self.nb_full = col((qqs[iu, ju] >= 0.999).astype(np.float32))

        self.bond_k = col(sys.bond_k)
        self.bond_r0 = col(sys.bond_r0, fill=1.0)
        self.ang_k = col(sys.angle_k)
        self.ang_t0 = col(sys.angle_t0)
        self.dih_pk = col(sys.dih_pk)
        self.dih_phase = col(sys.dih_phase)
        self.dih_n = col(sys.dih_n, fill=1.0)

        m3 = np.repeat(np.asarray(sys.masses), 3)
        self.minv = col(1.0 / m3, self.R3)    # 0 on padding rows
        self.rowmask = col(np.ones(A3), self.R3)

        self.method = sys.method
        self.cutoff = float(sys.cutoff)
        self.eps_rf = float(sys.eps_rf)
        # minimum-image box for CutoffPeriodic (applied to the pair rows;
        # bonded difference vectors stay unwrapped-small by construction)
        self.box = (tuple(float(b) for b in sys.box)
                    if sys.method == "CutoffPeriodic" and sys.box is not None
                    else None)


CONST_NAMES = ("D", "DT", "nb_qq", "nb_eps", "nb_rmin", "nb_full",
               "bond_k", "bond_r0", "ang_k", "ang_t0",
               "dih_pk", "dih_phase", "dih_n")


def plan_consts(plan: PallasMDPlan):
    return tuple(jnp.asarray(getattr(plan, n)) for n in CONST_NAMES)


def _atan_poly(z):
    """Minimax-style arctan on |z| <= 1 (elementwise; Mosaic has no
    inverse-trig lowering).  Max error ~1e-6 rad."""
    z2 = z * z
    return z * (0.99997726 + z2 * (-0.33262347 + z2 * (0.19354346
                + z2 * (-0.11643287 + z2 * (0.05265332 - z2 * 0.01172120)))))


def _atan2(y, x):
    """Elementwise atan2 from the bounded-arg polynomial."""
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    hi = jnp.maximum(ax, ay)
    lo = jnp.minimum(ax, ay)
    z = lo / jnp.maximum(hi, 1e-30)
    a = _atan_poly(z)
    a = jnp.where(ay > ax, (np.pi / 2) - a, a)
    a = jnp.where(x < 0, np.pi - a, a)
    return jnp.where(y < 0, -a, a)


def make_force_parts(plan: PallasMDPlan, consts=None):
    """Kernel-layout force computation split into reusable pieces:

    - ``diff(x)``: coordinate block (R3, TB) -> difference rows (3 NR, TB)
      via the D matmul;
    - ``grows(d)``: difference rows -> per-row energy gradients g (3 NR, TB)
      plus the pair-row auxiliaries (px, py, pz, r) needed by consumers that
      share the difference rows (e.g. the in-kernel chi-bias, which reuses
      the pair distances as the model features);
    - ``apply_DT(g)``: g -> D^T g (coordinate-space gradient).

    ``forces(x) = -apply_DT(grows(diff(x))[0])``."""
    NR = plan.NR
    (D, DT, nb_qq, nb_eps, nb_rmin, nb_full, bond_k, bond_r0, ang_k,
     ang_t0, dih_pk, dih_phase, dih_n) = (
        plan_consts(plan) if consts is None else consts)

    use_rf = plan.method != "NoCutoff"
    rc = plan.cutoff
    krf = (1.0 / rc ** 3) * (plan.eps_rf - 1.0) / (2 * plan.eps_rf + 1.0)
    # (the RF constant-shift crf contributes no force)

    spr, sbd = plan.sl_pairs, plan.sl_bonds
    su, sv = plan.sl_ang_u, plan.sl_ang_v
    s1, s2, s3 = plan.sl_b1, plan.sl_b2, plan.sl_b3
    npad = NR - plan.nrows

    def seg(a, s):
        return a[s.start:s.stop]

    def _split_dot(A, b):
        """f32-accurate A @ b in two DEFAULT-precision MXU passes: A has
        exact bf16 entries (+-1/0 incidence), so only b needs the hi/lo
        split — 3x cheaper than a HIGHEST-precision f32 matmul."""
        b_hi = b.astype(jnp.bfloat16).astype(jnp.float32)
        b_lo = b - b_hi
        dn = (((1,), (0,)), ((), ()))
        return (jax.lax.dot_general(A, b_hi, dn,
                                    preferred_element_type=jnp.float32)
                + jax.lax.dot_general(A, b_lo, dn,
                                      preferred_element_type=jnp.float32))

    def diff(x):
        return _split_dot(D, x)

    def apply_DT(g):
        return _split_dot(DT, g)

    def grows(d):
        TB = d.shape[1]
        dx, dy, dz = d[:NR], d[NR:2 * NR], d[2 * NR:3 * NR]

        # ---- nonbonded on pair rows -------------------------------------
        pxu, pyu, pzu = seg(dx, spr), seg(dy, spr), seg(dz, spr)
        if plan.box is not None:
            bx, by, bz = plan.box
            px = pxu - bx * jnp.round(pxu * (1.0 / bx))
            py = pyu - by * jnp.round(pyu * (1.0 / by))
            pz = pzu - bz * jnp.round(pzu * (1.0 / bz))
        else:
            px, py, pz = pxu, pyu, pzu
        r2 = px * px + py * py + pz * pz + 1e-12
        inv_r2 = 1.0 / r2
        r = jnp.sqrt(r2)
        x6 = (nb_rmin * nb_rmin * inv_r2) ** 3
        # dE/dr2: LJ eps(x6^2 - 2 x6) -> 6*eps*(x6 - x6^2)/r2
        g_lj = 6.0 * nb_eps * (x6 - x6 * x6) * inv_r2
        g_c_plain = nb_qq * (-0.5 * inv_r2 / r)
        if use_rf:
            within = (r < rc).astype(jnp.float32)
            g_c = jnp.where(nb_full > 0, (g_c_plain + nb_qq * krf) * within,
                            g_c_plain)
            g_lj = jnp.where(nb_full > 0, g_lj * within, g_lj)
            g_nb = g_lj + g_c
        else:
            g_nb = g_lj + g_c_plain
        gpx, gpy, gpz = 2 * g_nb * px, 2 * g_nb * py, 2 * g_nb * pz

        # ---- bonds --------------------------------------------------------
        bx, by, bz = seg(dx, sbd), seg(dy, sbd), seg(dz, sbd)
        rb = jnp.sqrt(bx * bx + by * by + bz * bz + 1e-12)
        gb = 2.0 * bond_k * (rb - bond_r0) / rb
        gbx, gby, gbz = gb * bx, gb * by, gb * bz

        # ---- angles ---------------------------------------------------------
        ux, uy, uz = seg(dx, su), seg(dy, su), seg(dz, su)
        vx, vy, vz = seg(dx, sv), seg(dy, sv), seg(dz, sv)
        uu = ux * ux + uy * uy + uz * uz + 1e-12
        vv = vx * vx + vy * vy + vz * vz + 1e-12
        uv = ux * vx + uy * vy + uz * vz
        inv_norm = jax.lax.rsqrt(uu * vv)
        cos_t = jnp.clip(uv * inv_norm, -1.0 + 1e-7, 1.0 - 1e-7)
        sin_t = jnp.sqrt(1.0 - cos_t * cos_t)
        # acos via polynomial atan2 (no Mosaic lowering for inverse trig)
        theta = _atan2(sin_t, cos_t)
        coef = -2.0 * ang_k * (theta - ang_t0) / sin_t
        cu = coef * inv_norm
        cuu = coef * cos_t / uu
        cvv = coef * cos_t / vv
        gux, guy, guz = cu * vx - cuu * ux, cu * vy - cuu * uy, cu * vz - cuu * uz
        gvx, gvy, gvz = cu * ux - cvv * vx, cu * uy - cvv * vy, cu * uz - cvv * vz

        # ---- dihedrals ------------------------------------------------------
        b1x, b1y, b1z = seg(dx, s1), seg(dy, s1), seg(dz, s1)
        b2x, b2y, b2z = seg(dx, s2), seg(dy, s2), seg(dz, s2)
        b3x, b3y, b3z = seg(dx, s3), seg(dy, s3), seg(dz, s3)
        n1x = b1y * b2z - b1z * b2y
        n1y = b1z * b2x - b1x * b2z
        n1z = b1x * b2y - b1y * b2x
        n2x = b2y * b3z - b2z * b3y
        n2y = b2z * b3x - b2x * b3z
        n2z = b2x * b3y - b2y * b3x
        n1sq = n1x * n1x + n1y * n1y + n1z * n1z + 1e-12
        n2sq = n2x * n2x + n2y * n2y + n2z * n2z + 1e-12
        b2sq = b2x * b2x + b2y * b2y + b2z * b2z + 1e-12
        b2n = jnp.sqrt(b2sq)
        m1x = (n1y * b2z - n1z * b2y) / b2n
        m1y = (n1z * b2x - n1x * b2z) / b2n
        m1z = (n1x * b2y - n1y * b2x) / b2n
        yy = m1x * n2x + m1y * n2y + m1z * n2z
        xx = n1x * n2x + n1y * n2y + n1z * n2z
        phi = _atan2(yy, xx)
        dEdphi = -dih_pk * dih_n * jnp.sin(dih_n * phi - dih_phase)
        # dphi/db1 = -(b2n/n1sq) n1 ; dphi/db3 = -(b2n/n2sq) n2
        # dphi/db2 = -(b1.b2/b2sq) dphi/db1 - (b3.b2/b2sq) dphi/db3
        # (validated against autodiff to machine precision)
        c1 = -b2n / n1sq
        c3 = -b2n / n2sq
        p12 = (b1x * b2x + b1y * b2y + b1z * b2z) / b2sq
        p32 = (b3x * b2x + b3y * b2y + b3z * b2z) / b2sq
        g1x, g1y, g1z = c1 * n1x, c1 * n1y, c1 * n1z
        g3x, g3y, g3z = c3 * n2x, c3 * n2y, c3 * n2z
        g2x = -p12 * g1x - p32 * g3x
        g2y = -p12 * g1y - p32 * g3y
        g2z = -p12 * g1z - p32 * g3z

        zpad = jnp.zeros((npad, TB), jnp.float32)
        gx = jnp.concatenate([gpx, gbx, gux, gvx, dEdphi * g1x,
                              dEdphi * g2x, dEdphi * g3x, zpad], axis=0)
        gy = jnp.concatenate([gpy, gby, guy, gvy, dEdphi * g1y,
                              dEdphi * g2y, dEdphi * g3y, zpad], axis=0)
        gz = jnp.concatenate([gpz, gbz, guz, gvz, dEdphi * g1z,
                              dEdphi * g2z, dEdphi * g3z, zpad], axis=0)
        g = jnp.concatenate([gx, gy, gz], axis=0)
        # aux: UNWRAPPED pair geometry — the chi-bias consumer must match
        # the host featurizer (FeaturesAll.flatpairdists never wraps);
        # unused outputs are dead-code-eliminated in the plain kernel
        r_u = jnp.sqrt(pxu * pxu + pyu * pyu + pzu * pzu + 1e-12)
        return g, (pxu, pyu, pzu, r_u)

    return diff, grows, apply_DT


def make_forces_fn(plan: PallasMDPlan, consts=None):
    """Pure-jnp force evaluation in kernel layout: x (R3, TB) -> F (R3, TB).

    Used both inside the Pallas kernel (consts read from refs) and
    standalone (for validation and as an alternative XLA formulation)."""
    diff, grows, apply_DT = make_force_parts(plan, consts)

    def forces(x):
        g, _ = grows(diff(x))
        return -apply_DT(g)

    return forces


def langevin_middle_fused(sys: MDSystem, x0, v0, T, gamma, dt, nsteps,
                          key, block=256, interpret=False):
    """Whole LangevinMiddle trajectories in VMEM (Pallas).

    ``x0``, ``v0``: (B, 3N); B must be a multiple of ``block``.
    Returns (x, v) after ``nsteps``."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    plan = PallasMDPlan(sys)
    B, A3 = x0.shape
    assert A3 == plan.A3
    assert B % block == 0, f"batch {B} not a multiple of block {block}"
    R3 = plan.R3

    consts = plan_consts(plan) + (jnp.asarray(plan.minv),
                                  jnp.asarray(plan.rowmask))
    a_o = math.exp(-gamma * dt)
    b_o = math.sqrt(1.0 - a_o * a_o)
    dt2 = dt / 2.0
    kBT = KB * T

    def kernel(seed_ref, x_ref, v_ref, *refs):
        crefs = refs[:len(consts)]
        xo_ref, vo_ref = refs[len(consts):]
        cvals = tuple(r[:] for r in crefs)
        minv = cvals[-2]
        rowmask = cvals[-1]
        forces = make_forces_fn(plan, cvals[:-2])
        vstd = jnp.sqrt(kBT * minv)

        if interpret:
            # the TPU hardware PRNG has no CPU interpret lowering; interpret
            # mode runs noiseless (forces/integrator arithmetic only —
            # thermal statistics are validated on real TPU)
            def gaussian(shape):
                return jnp.zeros(shape, jnp.float32)
        else:
            pltpu.prng_seed(seed_ref[pl.program_id(0)])

            def gaussian(shape):
                b1 = pltpu.prng_random_bits(shape)
                b2 = pltpu.prng_random_bits(shape)
                u1 = (b1.astype(jnp.float32) + 2147483648.0) / 4294967296.0
                u2 = (b2.astype(jnp.float32) + 2147483648.0) / 4294967296.0
                u1 = jnp.clip(u1, 1e-7, 1.0 - 1e-7)
                return jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(
                    (2.0 * np.pi) * u2)

        def step(i, carry):
            x, v = carry
            f = forces(x)
            v = v + dt * f * minv
            x = x + dt2 * v
            v = a_o * v + b_o * vstd * gaussian(x.shape)
            x = x + dt2 * v
            return (x, v)

        x, v = jax.lax.fori_loop(0, nsteps, step, (x_ref[:], v_ref[:]))
        xo_ref[:] = x * rowmask
        vo_ref[:] = v * rowmask

    def to_kernel_layout(z):
        zt = jnp.swapaxes(jnp.asarray(z, jnp.float32), 0, 1)     # (A3, B)
        return jnp.zeros((R3, B), jnp.float32).at[:A3].set(zt)

    xk = to_kernel_layout(x0)
    vk = to_kernel_layout(v0)
    seeds = jax.random.randint(key, (B // block,), 0, 2**31 - 1,
                               dtype=jnp.int32)

    def cspec(c):
        return pl.BlockSpec(c.shape, lambda b, _nd=c.ndim: (0,) * _nd)

    xo, vo = pl.pallas_call(
        kernel,
        grid=(B // block,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((R3, block), lambda b: (0, b)),
            pl.BlockSpec((R3, block), lambda b: (0, b)),
        ] + [cspec(c) for c in consts],
        out_specs=[
            pl.BlockSpec((R3, block), lambda b: (0, b)),
            pl.BlockSpec((R3, block), lambda b: (0, b)),
        ],
        out_shape=[jax.ShapeDtypeStruct((R3, B), jnp.float32),
                   jax.ShapeDtypeStruct((R3, B), jnp.float32)],
        interpret=interpret,
    )(seeds, xk, vk, *consts)

    return jnp.swapaxes(xo[:A3], 0, 1), jnp.swapaxes(vo[:A3], 0, 1)


def forces_rowmajor(sys: MDSystem, x):
    """Standalone force evaluation through the difference-operator
    formulation; ``x``: (B, 3N) -> (B, 3N).  For validation/benchmarks."""
    plan = PallasMDPlan(sys)
    forces = make_forces_fn(plan)
    xk = jnp.swapaxes(jnp.asarray(x, jnp.float32), 0, 1)
    xk = jnp.zeros((plan.R3, x.shape[0]), jnp.float32).at[:plan.A3].set(xk)
    f = forces(xk)
    return jnp.swapaxes(f[:plan.A3], 0, 1)


# ==========================================================================
# In-kernel chi-MLP bias: Girsanov-weighted (optcontrol) sampling at
# kernel speed (reference ``langevin_girsanov!`` + ``optcontrol``,
# src/simulators/openmm.jl:569-667 — there a host-side Julia loop calling
# OpenMM forces and Zygote gradients each step).
#
# The kernel already computes every pair distance (the chi model's
# features) on its pair rows; chi and d chi/d r are one small MLP forward
# + hand-written backward away (all (dim, TB) matmuls), and the bias force
# returns to coordinate space through the same D^T matmul as the physical
# forces.
# ==========================================================================


class ChiBiasPlan:
    """Host-side preparation of a chi-MLP bias for the fused kernel.

    Supports the default chi-model family (``models.pairnet``: optional
    input LayerNorm, sigmoid hidden layers, identity scalar output) whose
    input features are the all-pairs distances — exactly the kernel's pair
    rows.  All layer dimensions are zero-padded to multiples of 8 so every
    matmul is Mosaic-tileable; zero weight rows/columns make the padding
    units inert in both passes.
    """

    def __init__(self, plan: PallasMDPlan, sizes, layernorm: bool):
        npairs = plan.sl_pairs.stop - plan.sl_pairs.start
        if sizes[0] != npairs:
            raise ValueError(f"chi model expects {sizes[0]} features, "
                             f"kernel has {npairs} pair rows")
        if sizes[-1] != 1:
            raise ValueError("in-kernel bias needs a scalar chi model")
        self.npairs = npairs
        self.nlayers = len(sizes) - 1
        self.layernorm = bool(layernorm)
        self.sizes = tuple(sizes)
        self.padded = tuple([_round_up(npairs, 8)]
                            + [_round_up(s, 8) for s in sizes[1:]])

    def cols(self, params):
        """Padded constant arrays from an MLP params pytree.  Pure jnp (and
        thus jit-traceable), so the chi model's weights stay *runtime*
        inputs of the kernel — adaptive loops update them between
        generations without recompiling."""
        def pad2(a, rows, cols_):
            a = jnp.asarray(a, jnp.float32)
            return jnp.zeros((rows, cols_), jnp.float32).at[
                :a.shape[0], :a.shape[1]].set(a)

        def padcol(v, rows):
            v = jnp.asarray(v, jnp.float32).ravel()
            return jnp.zeros((rows, 1), jnp.float32).at[:v.shape[0], 0].set(v)

        cols = []
        for i, l in enumerate(params["layers"]):
            cols.append(pad2(l["w"], self.padded[i], self.padded[i + 1]))
            cols.append(padcol(l["b"], self.padded[i + 1]))
        fmask = np.zeros((self.padded[0], 1), np.float32)
        fmask[:self.npairs, 0] = 1.0
        cols.append(jnp.asarray(fmask))
        if self.layernorm:
            cols.append(padcol(params["ln"]["gamma"], self.padded[0]))
            cols.append(padcol(params["ln"]["beta"], self.padded[0]))
        return tuple(cols)


def make_chi_grad_fn(bias_plan: ChiBiasPlan):
    """chi(f) and dchi/df in kernel layout.

    Returns ``chi_grad(cols, f)`` with ``f``: (npairs, TB) pair-distance
    rows -> ``(chi (1, TB), dchi_df (npairs, TB))``.  Matmul-only forward
    and hand-written backward (sigmoid derivative from cached activations,
    LayerNorm backward via masked row means).
    """
    L = bias_plan.nlayers
    npairs = bias_plan.npairs
    FP = bias_plan.padded[0]
    layernorm = bias_plan.layernorm
    dn_fwd = (((0,), (0,)), ((), ()))     # W^T @ h : contract over `in`
    dn_bwd = (((1,), (0,)), ((), ()))     # W  @ g : contract over `out`

    def chi_grad(cols, f):
        TB = f.shape[1]
        ws = [cols[2 * i] for i in range(L)]
        bs = [cols[2 * i + 1] for i in range(L)]
        fmask = cols[2 * L]
        fp = jnp.concatenate(
            [f, jnp.zeros((FP - npairs, TB), jnp.float32)], axis=0)

        if layernorm:
            gamma, beta = cols[2 * L + 1], cols[2 * L + 2]
            mu = jnp.sum(fp * fmask, axis=0, keepdims=True) / npairs
            var = jnp.sum((fp - mu) ** 2 * fmask, axis=0,
                          keepdims=True) / npairs
            inv_std = jax.lax.rsqrt(var + 1e-5)
            xn = (fp - mu) * inv_std * fmask
            h = xn * gamma + beta * fmask
        else:
            h = fp * fmask

        hs = []
        # pair-distance-derived activations: bf16 default matmul precision
        # would put ~1e-3 relative error on the bias force (repo rule:
        # coordinate-touching matmuls run HIGHEST)
        prec = jax.lax.Precision.HIGHEST
        for i in range(L):
            z = jax.lax.dot_general(ws[i], h, dn_fwd, precision=prec,
                                    preferred_element_type=jnp.float32) + bs[i]
            if i < L - 1:
                h = jax.nn.sigmoid(z)
                hs.append(h)
            else:
                h = z
        chi = h[0:1]

        g = jnp.concatenate(
            [jnp.ones((1, TB), jnp.float32),
             jnp.zeros((h.shape[0] - 1, TB), jnp.float32)], axis=0)
        for i in range(L - 1, -1, -1):
            if i < L - 1:
                s = hs[i]
                g = g * (s * (1.0 - s))
            g = jax.lax.dot_general(ws[i], g, dn_bwd, precision=prec,
                                    preferred_element_type=jnp.float32)

        if layernorm:
            gx = g * gamma
            m1 = jnp.sum(gx * fmask, axis=0, keepdims=True) / npairs
            m2 = jnp.sum(gx * xn, axis=0, keepdims=True) / npairs
            g = inv_std * (gx - m1 * fmask - xn * m2)
        return chi, g[:npairs] * fmask[:npairs]

    return chi_grad


def aboba_girsanov_fused(sys: MDSystem, x0, p0, T, gamma, dt, nsteps, key,
                         model, params=None, forcescale=1.0, b=0.5,
                         qrate=0.0, Tmax=None, block=256, interpret=False):
    """Whole Girsanov-weighted ABOBA trajectories in VMEM (Pallas).

    Underdamped ABOBA splitting with the chi-derived optimal-control bias
    (``integrators.optcontrol`` family) evaluated *inside* the kernel:

        B(q, t) = forcescale * sigma^2 * lam(t) grad chi(q)
                                        / (lam(t) (chi(q) - b) + b)
        lam(t)  = exp(qrate (Tmax - t)),  sigma^2 = 2 kB T gamma m

    with the Girsanov log-weight increment
    ``dlogw = -(eta . deta + |deta|^2 / 2)``, ``deta = (a+1)/famp dt/2 B``
    — exactly the XLA path (``integrators.aboba_girsanov`` with
    ``optcontrol``'s sigmascaled bias), reference
    ``src/simulators/openmm.jl:569-667``.

    ``x0``, ``p0``: (B, 3N) positions/momenta; B a multiple of ``block``.
    ``model``: the chi MLP spec; ``params`` its weights (runtime inputs —
    adaptive loops can update them without recompiling).
    Returns (q, p, logw) with logw (B,).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    plan = PallasMDPlan(sys)
    bias_plan = ChiBiasPlan(plan, model.sizes, model.layernorm)
    if model.activation != "sigmoid" or model.lastactivation != "identity":
        raise ValueError("in-kernel bias supports sigmoid/identity MLPs")
    params = model.params if params is None else params
    B, A3 = x0.shape
    assert A3 == plan.A3
    assert B % block == 0, f"batch {B} not a multiple of block {block}"
    R3, NR = plan.R3, plan.NR
    npairs = bias_plan.npairs

    a_o = math.exp(-gamma * dt)
    t2 = dt / 2.0
    kBT = KB * T
    c_deta = (a_o + 1.0) * t2

    m3 = np.repeat(np.asarray(sys.masses, np.float64), 3)
    famp_np = np.sqrt(kBT * m3 * (1.0 - a_o * a_o))

    def col(v, fill=0.0):
        out = np.full((R3, 1), fill, np.float32)
        out[:A3, 0] = v
        return jnp.asarray(out)

    famp = col(famp_np)                       # 0 on padding rows
    inv_famp = col(1.0 / famp_np)             # 0 on padding rows
    fs_sig2 = col(forcescale * 2.0 * kBT * gamma * m3)

    consts = (plan_consts(plan) + (jnp.asarray(plan.minv),
                                   jnp.asarray(plan.rowmask),
                                   famp, inv_famp, fs_sig2)
              + bias_plan.cols(params))
    nforce = len(CONST_NAMES)
    chi_grad = make_chi_grad_fn(bias_plan)

    def kernel(seed_ref, scal_ref, x_ref, p_ref, *refs):
        crefs = refs[:len(consts)]
        xo_ref, po_ref, lw_ref = refs[len(consts):]
        cvals = tuple(r[:] for r in crefs)
        minv, rowmask, famp_c, invf_c, fs2_c = cvals[nforce:nforce + 5]
        bias_cols = cvals[nforce + 5:]
        diff, grows, apply_DT = make_force_parts(plan, cvals[:nforce])
        b_s = scal_ref[0]
        qrate_s = scal_ref[1]
        tmax_s = scal_ref[2]

        if interpret:
            def gaussian(shape):
                return jnp.zeros(shape, jnp.float32)
        else:
            pltpu.prng_seed(seed_ref[pl.program_id(0)])

            def gaussian(shape):
                b1 = pltpu.prng_random_bits(shape)
                b2 = pltpu.prng_random_bits(shape)
                u1 = (b1.astype(jnp.float32) + 2147483648.0) / 4294967296.0
                u2 = (b2.astype(jnp.float32) + 2147483648.0) / 4294967296.0
                u1 = jnp.clip(u1, 1e-7, 1.0 - 1e-7)
                return jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(
                    (2.0 * np.pi) * u2)

        def step(i, carry):
            q, p, logw = carry
            t = i.astype(jnp.float32) * dt
            eta = gaussian(q.shape)
            q = q + t2 * p * minv                              # A
            d_ = diff(q)
            g, (px, py, pz, r) = grows(d_)
            F = -apply_DT(g)
            chi, gf = chi_grad(bias_cols, r)
            lam_t = jnp.exp(qrate_s * (tmax_s - t))
            # psi floored exactly like integrators.optcontrol (PSI_FLOOR):
            # keeps the bias force and Girsanov weight finite where chi
            # strays below the psi > 0 region
            denom = jnp.maximum(lam_t * (chi - b_s) + b_s, PSI_FLOOR)
            w_pair = (lam_t / denom) * gf / r                  # (npairs, TB)
            zrest = jnp.zeros((NR - npairs, q.shape[1]), jnp.float32)
            gb = jnp.concatenate([w_pair * px, zrest,
                                  w_pair * py, zrest,
                                  w_pair * pz, zrest], axis=0)
            Bf = fs2_c * apply_DT(gb)
            deta = c_deta * Bf * invf_c
            logw = logw - jnp.sum(eta * deta + 0.5 * deta * deta,
                                  axis=0, keepdims=True)
            half = t2 * (F + Bf)
            p = p + half                                       # B
            p = a_o * p + famp_c * eta                         # O
            p = p + half                                       # B
            q = q + t2 * p * minv                              # A
            return (q, p, logw)

        lw0 = jnp.zeros((1, x_ref.shape[1]), jnp.float32)
        q, p, logw = jax.lax.fori_loop(0, nsteps, step,
                                       (x_ref[:], p_ref[:], lw0))
        xo_ref[:] = q * rowmask
        po_ref[:] = p * rowmask
        lw_ref[:] = logw

    def to_kernel_layout(z):
        zt = jnp.swapaxes(jnp.asarray(z, jnp.float32), 0, 1)
        return jnp.zeros((R3, B), jnp.float32).at[:A3].set(zt)

    xk = to_kernel_layout(x0)
    pk = to_kernel_layout(p0)
    seeds = jax.random.randint(key, (B // block,), 0, 2**31 - 1,
                               dtype=jnp.int32)
    tmax = nsteps * dt if Tmax is None else Tmax
    # b / qrate / Tmax may be traced values: the adaptive loop updates them
    # every generation without recompiling (they ride in SMEM)
    scal = jnp.stack([jnp.asarray(b, jnp.float32),
                      jnp.asarray(qrate, jnp.float32),
                      jnp.asarray(tmax, jnp.float32)])

    def cspec(c):
        return pl.BlockSpec(c.shape, lambda blk, _nd=c.ndim: (0,) * _nd)

    xo, po, lw = pl.pallas_call(
        kernel,
        grid=(B // block,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((R3, block), lambda blk: (0, blk)),
            pl.BlockSpec((R3, block), lambda blk: (0, blk)),
        ] + [cspec(c) for c in consts],
        out_specs=[
            pl.BlockSpec((R3, block), lambda blk: (0, blk)),
            pl.BlockSpec((R3, block), lambda blk: (0, blk)),
            pl.BlockSpec((1, block), lambda blk: (0, blk)),
        ],
        out_shape=[jax.ShapeDtypeStruct((R3, B), jnp.float32),
                   jax.ShapeDtypeStruct((R3, B), jnp.float32),
                   jax.ShapeDtypeStruct((1, B), jnp.float32)],
        interpret=interpret,
    )(seeds, scal, xk, pk, *consts)

    return (jnp.swapaxes(xo[:A3], 0, 1), jnp.swapaxes(po[:A3], 0, 1),
            lw[0])
