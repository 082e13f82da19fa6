"""Monte Carlo barostat + NPT propagation (traced-box design).

The reference gets NPT from OpenMM's ``MonteCarloBarostat`` and handles
barostat box updates when reading states (``src/simulators/
mopenmm.py:204-212``).  TPU-native rebuild per ``docs/npt_design.md``:
the box is a *runtime* value threaded through the dense energy path
(``forces.potential_energy(sys, x, box)``) and the Ewald tables, so
volume moves never recompile.

Semantics follow OpenMM's MonteCarloBarostat:
- every ``interval`` steps propose ``V' = V + dV``, ``dV ~ U(-s, s)``;
- molecule *centers* scale by ``(V'/V)^(1/3)`` (molecules stay rigid, so
  constraints remain satisfied exactly);
- accept with ``exp(-beta (dU + P dV - N_mol kT ln(V'/V)))``;
- ``s`` adapts toward ~50% acceptance (x1.1 up / /1.1 down every 10
  proposals, as in OpenMM).

Everything is jit-compatible: the volume move is a ``lax.cond``-free
masked update (propose + accept as a weight), the molecule map is a
static gather, and the adaptive step size lives in the carried state.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .system import MDSystem, KB
from .forces import potential_energy

BAR_TO_KJ_NM3 = 0.0602214076      # 1 bar in kJ/mol/nm^3


def molecule_map(sys: MDSystem, extra_pairs=None):
    """(natoms,) molecule ids from the bond graph (host, once).

    ``extra_pairs``: additional connectivity not present in
    ``sys.bond_idx`` — rigid waters on the sparse path have their bond
    terms *stripped* (replaced by constraints), so the water triplets
    must be passed here or every water atom becomes its own molecule."""
    n = sys.natoms
    parent = list(range(n))

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    pairs = [tuple(p) for p in np.asarray(sys.bond_idx)]
    if extra_pairs is not None:
        pairs += [tuple(p) for p in np.asarray(extra_pairs).reshape(-1, 2)]
    for a, b in pairs:
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[ra] = rb
    roots = [find(i) for i in range(n)]
    uniq = {r: k for k, r in enumerate(dict.fromkeys(roots))}
    return np.asarray([uniq[r] for r in roots], np.int32)


class MonteCarloBarostat:
    """State + jitted volume move for NPT (dense-path systems)."""

    def __init__(self, sys: MDSystem, pressure: float = 1.0,
                 temp: float = 300.0, interval: int = 25,
                 initial_scale: float = None, x0=None,
                 box_slack: float = 0.1, extra_pairs=None):
        if sys.box is None:
            raise ValueError("barostat requires a periodic box")
        self.sys = sys
        self.plan = None
        if not sys.dense_pairs:
            # O(n) systems: one static-stencil plan valid for boxes down
            # to (1 - box_slack) of the build box (docs/npt_design.md)
            from .neighbor import NeighborPlan
            self.plan = NeighborPlan(
                sys, x0=None if x0 is None
                else np.asarray(x0).reshape(-1, 3),
                box_slack=box_slack)
        self.pressure = float(pressure) * BAR_TO_KJ_NM3   # kJ/mol/nm^3
        self.kt = KB * float(temp)
        self.interval = int(interval)
        mol = molecule_map(sys, extra_pairs=extra_pairs)
        self.mol_id = jnp.asarray(mol)
        self.nmol = int(mol.max()) + 1
        # mass-weighted molecule centers via one (nmol, natoms) matmul
        M = np.zeros((self.nmol, sys.natoms), np.float32)
        M[mol, np.arange(sys.natoms)] = np.asarray(sys.masses)
        self.center_M = jnp.asarray(M / M.sum(axis=1, keepdims=True))
        V0 = float(np.prod(sys.box))
        self.scale0 = float(initial_scale if initial_scale is not None
                            else 0.01 * V0)

    def init_state(self, box=None):
        """(box, dV_scale, n_attempted, n_accepted, window_accepted)."""
        box = jnp.asarray(self.sys.box if box is None else box, jnp.float32)
        return (box, jnp.asarray(self.scale0, jnp.float32),
                jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32),
                jnp.zeros((), jnp.int32))

    def move(self, key, x, state):
        """One MC volume move.  ``x``: (natoms, 3); returns (x', state')."""
        box, dv_scale, n_att, n_acc, win_acc = state
        # virtual-site rows in the integrator state are stale (sites are
        # pinned during dynamics); re-place before energies and centers.
        # A rigid per-molecule translation commutes with the affine
        # placement, so the moved frame stays exactly placed.
        from .vsites import place_vsites
        x = place_vsites(self.sys, x)
        k1, k2 = jax.random.split(key)
        V = jnp.prod(box)
        dV = dv_scale * jax.random.uniform(k1, (), minval=-1.0, maxval=1.0)
        Vn = V + dV
        f = (Vn / V) ** (1.0 / 3.0)

        centers = jnp.matmul(self.center_M, x,
                             precision=jax.lax.Precision.HIGHEST)
        disp = (f - 1.0) * centers            # (nmol, 3)
        xn = x + disp[self.mol_id]
        boxn = box * f

        if self.plan is not None:
            from .neighbor import potential_energy_neighbor
            u0 = potential_energy_neighbor(self.sys, x, self.plan, box=box)
            u1 = potential_energy_neighbor(self.sys, xn, self.plan,
                                           box=boxn)
        else:
            u0 = potential_energy(self.sys, x, box=box)
            u1 = potential_energy(self.sys, xn, box=boxn)
        w = (u1 - u0 + self.pressure * dV
             - self.nmol * self.kt * jnp.log(Vn / V))
        accept = (jax.random.uniform(k2, ()) < jnp.exp(
            jnp.clip(-w / self.kt, -50.0, 50.0))) & (Vn > 0)

        x_out = jnp.where(accept, xn, x)
        box_out = jnp.where(accept, boxn, box)
        n_att = n_att + 1
        n_acc = n_acc + accept.astype(jnp.int32)
        win_acc = win_acc + accept.astype(jnp.int32)
        # OpenMM-style adaptation: acceptance over the LAST 10 attempts
        # (a cumulative fraction stops adapting as n_att grows)
        adapt = (n_att % 10) == 0
        frac = win_acc.astype(jnp.float32) / 10.0
        dv_scale = jnp.where(
            adapt & (frac < 0.25), dv_scale / 1.1,
            jnp.where(adapt & (frac > 0.75),
                      jnp.minimum(dv_scale * 1.1, 0.3 * jnp.prod(box_out)),
                      dv_scale))
        win_acc = jnp.where(adapt, 0, win_acc)
        return x_out, (box_out, dv_scale, n_att, n_acc, win_acc)


def npt_langevin(sim, x0=None, key=None, steps=1000, pressure=1.0,
                 interval=25, temp=None):
    """NPT propagation: LangevinMiddle blocks + MC volume moves.

    A dedicated jitted scan (dense path, traced box through forces) —
    the NVT fast paths (fused kernels, neighbor engine) stay untouched.
    Returns (x (3N,), box (3,), info dict)."""
    import jax.random as jr

    sys = sim.system
    temp = float(temp if temp is not None else sim.temp)
    key = jr.PRNGKey(0) if key is None else key
    x = jnp.asarray(sim.coords if x0 is None else x0).reshape(-1)
    baro = MonteCarloBarostat(sys, pressure=pressure, temp=temp,
                              interval=interval, x0=np.asarray(x))
    n3 = x.shape[0]

    dt = sim.step
    gamma = sim.friction
    kt = KB * temp
    m3 = sim.masses3
    c1 = jnp.exp(-gamma * dt)
    c3 = jnp.sqrt(kt * (1 - c1 ** 2)) * jnp.sqrt(1.0 / m3)

    if baro.plan is not None:
        from .neighbor import force_neighbor
        from .vsites import place_vsites, redistribute_forces

        def force(xf, box):
            # analytic path: place sites, hand their forces back to the
            # parents (the dense branch gets both from the autodiff chain
            # through potential_energy's internal placement)
            xp = place_vsites(sys, xf.reshape(-1, 3))
            f = force_neighbor(sys, xp, baro.plan, box=box)
            return redistribute_forces(sys, f, xp).reshape(-1)
    else:
        def force(xf, box):
            return -jax.grad(lambda z: potential_energy(
                sys, z.reshape(-1, 3), box=box))(xf)

    nblocks = max(1, steps // interval)

    def block(carry, k):
        xf, v, bstate = carry
        kmd, kmc = jr.split(k)

        def md_step(c, kk):
            xf, v = c
            box = bstate[0]
            v = v + (dt / m3) * force(xf, box)
            xf = xf + 0.5 * dt * v
            v = c1 * v + c3 * jr.normal(kk, (n3,))
            xf = xf + 0.5 * dt * v
            return (xf, v), None

        (xf, v), _ = jax.lax.scan(md_step, (xf, v),
                                  jr.split(kmd, interval))
        xm, bstate2 = baro.move(kmc, xf.reshape(-1, 3), bstate)
        return (xm.reshape(-1), v, bstate2), bstate2[0]

    v0 = jnp.sqrt(kt / m3) * jr.normal(jr.fold_in(key, 1), (n3,))
    (xf, vf, bstate), boxes = jax.lax.scan(
        block, (x, v0, baro.init_state()), jr.split(key, nblocks))
    box_f, dv_scale, n_att, n_acc, _ = bstate
    info = dict(boxes=boxes, attempted=int(n_att), accepted=int(n_acc),
                acceptance=float(n_acc) / max(int(n_att), 1),
                dv_scale=float(dv_scale))
    return xf, box_f, info
