"""MDSimulation: the TPU-native counterpart of the reference's
OpenMMSimulation (``src/simulators/openmm.jl:96-143``).

Wraps the built-in Amber-type force field (``isokann_tpu.md``) with the
IsoSimulation interface.  Where the reference steps one OpenMM context at a
time through Python FFI (``src/simulators/openmm.jl:286-315`` — serial
nx x nk loops), every propagation here is a single jitted device program
advancing all walkers at once.

Defaults mirror the reference (``src/simulators/mopenmm.py:10-27``,
``src/simulators/openmm.jl:103``): 310 K, friction 1/ps, 2 fs steps,
steps=100 (lagtime 0.2 ps), LangevinMiddle integrator, no constraints,
auto cutoff method.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .base import IsoSimulation
from ..data import WeightedSamples
from ..features import default_featurizer
from ..md import integrators as I
from ..md.constraints import ConstraintSet
from ..md.forces import force_flat, potential_energy_flat
from ..md.minimize import minimize_energy
from ..md.pdbio import read_pdb
from ..md.system import build_system, KB


def _integrator_masses3(system):
    """Per-coordinate masses for the integrators.  Virtual sites are
    massless; a huge-but-finite stand-in (1e30 amu) makes every integrator
    leave them in place (zero force response, zero Maxwell-Boltzmann
    velocity) without the inf*0 NaNs an infinite mass would produce in
    the EM/ABOBA noise terms.  Their true positions are recomputed from
    the parents at every force evaluation and on output
    (``md/vsites.py``)."""
    m = system.masses
    m = jnp.where(m > 0, m, jnp.asarray(1e30, m.dtype))
    return jnp.repeat(m, 3)


class MDSimulation(IsoSimulation):
    """Batched TPU molecular dynamics simulation.

    Arguments (mirroring OpenMMSimulation):
    - pdb: path to a PDB file (default: bundled alanine dipeptide)
    - steps: number of integrator steps per Koopman lag (default 100)
    - temp [K], friction [1/ps], step [ps]
    - integrator: "langevin" (LangevinMiddle) or "brownian" (overdamped EM)
    - features: featurizer spec (None -> all-pairs if <100 atoms else 100
      random pairs; int/float radius; pair list; atom list; callable)
    - minimize: energy-minimize the initial state
    - bias: optional bias force ``bias(x, t, sigma, F) -> u`` enabling
      Girsanov-weighted sampling (ABOBA integrator)
    - method/cutoff: nonbonded method override ("auto" per reference)
    - dense_pairs: True = dense all-pairs layout, False = O(n) cell-list
      neighbor engine, "auto" = switch at 4000 atoms
    """

    # class-level defaults: ``from_system`` and pickles from before the
    # Verlet mode bypass ``__init__``
    neighbor_mode = "cells"
    skin = 0.2

    def __init__(self, pdb: Optional[str] = None, steps: int = 100,
                 temp: float = 310.0, friction: float = 1.0,
                 step: float = 0.002, integrator: str = "langevin",
                 features=None, minimize: bool = False, bias=None,
                 method: str = "auto", cutoff: float = 1.0,
                 implicit: Optional[str] = None,
                 constraints: Optional[str] = None,
                 addwater: bool = False, padding: float = 1.0,
                 ionic_strength: float = 0.0, rigidwater: bool = True,
                 water_model: str = "tip3p",
                 dense_pairs="auto", dispersion_correction: bool = True,
                 neighbor_mode: str = "cells", skin: float = 0.2,
                 dtype=jnp.float32):
        # neighbor_mode="verlet" (opt-in): sparse systems propagate with
        # per-atom Verlet lists rebuilt every few steps (md/verlet.py)
        # instead of the per-step cell sweep
        if pdb is None:
            from ..md.fixtures import alanine_dipeptide_pdb
            pdb = alanine_dipeptide_pdb()
        if addwater and implicit is not None:
            raise ValueError("addwater and implicit solvent are exclusive")
        self.constructor = dict(pdb=pdb, steps=steps, temp=temp,
                                friction=friction, step=step,
                                integrator=integrator, features=features,
                                minimize=minimize, method=method,
                                cutoff=cutoff, implicit=implicit,
                                constraints=constraints, addwater=addwater,
                                padding=padding,
                                ionic_strength=ionic_strength,
                                rigidwater=rigidwater,
                                water_model=water_model,
                                dense_pairs=dense_pairs,
                                dispersion_correction=dispersion_correction,
                                neighbor_mode=neighbor_mode, skin=skin)
        if neighbor_mode not in ("cells", "verlet"):
            raise ValueError(f"unknown neighbor_mode {neighbor_mode!r}")
        self.neighbor_mode = neighbor_mode
        self.skin = float(skin)
        self.pdbfile = pdb
        self.steps = int(steps)
        self.temp = float(temp)
        self.friction = float(friction)
        self.step = float(step)
        self.integrator = integrator
        self.bias = bias

        self.structure = read_pdb(pdb)
        nsolute = self.structure.natoms
        if addwater:
            # TIP3P box + counterions (reference modeller.addSolvent,
            # mopenmm.py:59-66); solute atoms keep their indices
            from ..md.solvate import solvate
            self.structure = solvate(self.structure, padding=padding,
                                     ionic_strength=ionic_strength,
                                     model=water_model)
        self.system = build_system(self.structure if addwater else pdb,
                                   method=method, cutoff=cutoff,
                                   implicit=implicit,
                                   dense_pairs=dense_pairs,
                                   dispersion_correction=dispersion_correction,
                                   dtype=dtype)
        # 4-site waters (TIP4P-Ew, or any imported PDB with M/EPW extra
        # points): the M rows become virtual sites
        from ..md.solvate import water_msites
        vsi, vsp, vsw = water_msites(self.structure)
        if len(vsi):
            from ..md.vsites import attach_vsites
            self.system = attach_vsites(self.system, vsi, vsp, vsw)
        self.masses3 = _integrator_masses3(self.system)

        # holonomic constraints (reference mopenmm.py:117-125 pass-through)
        # + rigid TIP3P (reference default rigidWater=True, mopenmm.py:12)
        if constraints is not None and integrator != "langevin":
            raise ValueError("constraints require the langevin integrator")
        from ..md.solvate import water_triplets
        wt = water_triplets(self.structure) if rigidwater else None
        wt = wt if wt is not None and len(wt) else None
        if wt is not None and integrator != "langevin":
            import warnings
            warnings.warn("rigid water requires the langevin integrator; "
                          "waters stay flexible")
            wt = None
        self.constraint_set = (
            ConstraintSet(self.system, constraints, water=wt)
            if (constraints is not None or wt is not None) else None)
        if wt is not None and not self.system.dense_pairs:
            # rigid waters: their bond/angle terms are constraint-replaced;
            # dropping them keeps the sparse bonded pass solute-sized
            from ..md.neighbor import strip_rigid_water_bonded
            self.system = strip_rigid_water_bonded(self.system, wt)

        self._x0 = jnp.asarray(self.structure.coords.reshape(-1), dtype)
        if minimize:
            self._x0 = self.minimize(self._x0)
        if addwater and features is None:
            # solute-only default features (water pair distances are
            # diffusive noise; production solvated runs pass explicit
            # features in the reference as well)
            if nsolute < 100:
                features = [(i, j) for i in range(nsolute)
                            for j in range(i + 1, nsolute)]
            else:
                # uniform over all C(nsolute, 2) pairs, without replacement
                rng = np.random.default_rng(0)
                total = nsolute * (nsolute - 1) // 2
                ids = rng.choice(total, size=min(100, total), replace=False)
                ii = (np.floor((1 + np.sqrt(1 + 8 * ids)) / 2)).astype(int)
                jj = ids - ii * (ii - 1) // 2
                bad = jj < 0          # float-sqrt one-off correction
                ii[bad] -= 1
                jj[bad] = ids[bad] - ii[bad] * (ii[bad] - 1) // 2
                features = [(int(j), int(i)) for i, j in zip(ii, jj)]
        self.featurizer = default_featurizer(pdb, self.natoms, features)
        self._jit_cache = {}

    @classmethod
    def from_system(cls, system, x0, steps: int = 100, temp: float = 310.0,
                    friction: float = 1.0, step: float = 0.002,
                    integrator: str = "langevin", features=None,
                    minimize: bool = False, bias=None,
                    constraints: Optional[str] = None,
                    constraint_pairs=None, source: Optional[str] = None):
        """Build an MDSimulation around a prebuilt :class:`MDSystem`.

        The entry point for *imported* systems (Amber prmtop via
        ``md.amberio.system_from_prmtop``, serialized OpenMM System XML via
        ``md.openmm_xml.load_system_xml``) whose parameters must be used
        verbatim — no PDB/force-field pipeline runs.

        - ``x0``: initial coordinates, (natoms, 3) or flat (3 natoms,) [nm]
        - ``constraint_pairs``: explicit (i, j, d_nm) distance constraints
          (e.g. the XML ``<Constraints>`` block, which is how OpenMM
          represents rigid water); combined with the ``constraints``
          class string if both are given
        - ``features``: pair list / atom list / callable (the radius
          shorthand needs a PDB and is not available here); default =
          all-pairs under 100 atoms, else 100 random pairs
        - ``source``: provenance string kept in ``constructor``
        """
        self = cls.__new__(cls)
        self.constructor = dict(from_system=True, source=source,
                                steps=steps, temp=temp, friction=friction,
                                step=step, integrator=integrator,
                                features=features, minimize=minimize,
                                constraints=constraints,
                                constraint_pairs=constraint_pairs)
        self.pdbfile = source
        self.steps = int(steps)
        self.temp = float(temp)
        self.friction = float(friction)
        self.step = float(step)
        self.integrator = integrator
        self.bias = bias
        self.structure = None
        self.system = system
        self.masses3 = _integrator_masses3(system)

        if (constraints is not None or constraint_pairs) \
                and integrator != "langevin":
            raise ValueError("constraints require the langevin integrator")
        self.constraint_set = (
            ConstraintSet(system, constraints, pairs=constraint_pairs)
            if (constraints is not None or constraint_pairs) else None)

        self._x0 = jnp.asarray(np.asarray(x0).reshape(-1),
                               system.charges.dtype)
        if minimize:
            self._x0 = self.minimize(self._x0)
        if features is not None and isinstance(features, (int, float)) \
                and not isinstance(features, bool):
            raise ValueError("radius feature selection needs a PDB; pass "
                             "an explicit pair list")
        self.featurizer = default_featurizer(None, self.natoms, features)
        self._jit_cache = {}
        return self

    # ---- basic accessors (reference src/simulators/openmm.jl:148-239) ----

    def __getstate__(self):
        d = self.__dict__.copy()
        d["_jit_cache"] = {}
        d.pop("_nbplan", None)      # rebuilt lazily (device arrays)
        d.pop("_vplan", None)
        return d

    @property
    def natoms(self):
        return self.system.natoms

    @property
    def dim(self):
        return 3 * self.natoms

    @property
    def lagtime(self):
        """Physical lag in ps (reference ``src/simulators/openmm.jl:156``)."""
        return self.steps * self.step

    @property
    def coords(self):
        return self._x0

    def setcoords(self, x):
        self._x0 = jnp.asarray(x).reshape(-1)

    def masses(self):
        return self.system.masses

    def potential(self, x):
        """Potential energy [kJ/mol] at flat coords (batched)
        (reference ``src/simulators/openmm.jl:224-239``)."""
        return potential_energy_flat(self.system, jnp.asarray(x))

    def force(self, x):
        """Forces [kJ/mol/nm] at flat coords (batched)."""
        return force_flat(self.system, jnp.asarray(x))

    def minimize(self, x=None, maxiter=500):
        """FIRE energy minimization (OpenMM ``minimizeEnergy`` analog)."""
        x = self._x0 if x is None else jnp.asarray(x)
        from ..md.vsites import place_vsites_flat
        return place_vsites_flat(self.system, minimize_energy(
            lambda z: potential_energy_flat(self.system, z), x,
            maxiter=maxiter))

    def defaultmodel(self, n=None, nout=1, key=None, **kwargs):
        from ..models import autonet
        return autonet(n if n is not None else self.dim, nout=nout,
                       key=key, **kwargs)

    def random_velocities(self, key, shape):
        return I.maxwell_boltzmann(key, self.masses3, self.temp, shape)

    # ---- propagation -----------------------------------------------------

    def _force_fn(self):
        sys = self.system
        from ..md.vsites import (has_vsites, place_vsites_flat,
                                 redistribute_forces_flat)

        def vswrap(fn):
            if not has_vsites(sys):
                return fn

            def wrapped(x):
                xp = place_vsites_flat(sys, x)
                return redistribute_forces_flat(sys, fn(xp), xp)
            return wrapped

        if not sys.dense_pairs:
            # large solvated systems: O(n) cell-list neighbor engine with
            # analytic forces; plan capacity sized from the start coords
            from ..md.neighbor import NeighborPlan, force_flat_neighbor
            if getattr(self, "_nbplan", None) is None:
                self._nbplan = NeighborPlan(
                    sys, x0=np.asarray(self._x0).reshape(-1, 3))
            plan = self._nbplan
            return vswrap(lambda x: force_flat_neighbor(sys, x, plan))
        if self._nb_kernel_eligible():
            from ..md.pallas_gb import force_flat_hybrid
            return vswrap(lambda x: force_flat_hybrid(sys, x))
        return lambda x: force_flat(sys, x)      # handles sites internally

    def _nb_kernel_eligible(self) -> bool:
        """Medium systems (villin-class) on TPU use the VMEM nonbonded(+GBSA)
        force kernel (md/pallas_gb.py): the XLA path streams (B, n, n)
        intermediates through HBM, the kernel keeps them in VMEM.  Small
        systems use the fully fused trajectory kernel instead
        (``_pallas_eligible``); very large ones exceed the VMEM budget."""
        if self.system.method in ("CutoffPeriodic", "Ewald", "PME", "LJPME"):
            # the kernel supports minimum image (tested), but measured
            # even with the XLA path end-to-end at 1009 atoms (both are
            # VPU-compute-bound) while costing an extra remote compile —
            # not worth enabling by default; Ewald/PME additionally need
            # the reciprocal term the GB kernel does not compute
            return False
        if not (64 < self.natoms <= 640):   # GBPlan pads to 640 anyway
            return False
        try:
            return jax.devices()[0].platform == "tpu"
        except Exception:
            return False

    def _pallas_eligible(self, nwalkers: int) -> bool:
        """Use the fused VMEM trajectory kernel when it applies: TPU
        backend, plain LangevinMiddle (no bias/brownian), no GBSA, and a
        batch large enough to fill blocks (2.8x the XLA scan on v5e)."""
        if self.bias is not None or self.integrator != "langevin":
            return False
        if self.system.implicit is not None or self.constraint_set is not None:
            return False
        from ..md.vsites import has_vsites
        if has_vsites(self.system):
            return False         # the fused kernel integrates internally
        if self.system.method in ("Ewald", "PME", "LJPME"):
            # the fused kernel has no reciprocal-space term
            return False
        # the kernel's dense difference operator scales with all-pairs rows:
        # small-molecule systems only (<=64 atoms keeps D under ~10 MB)
        if self.natoms > 64:
            return False
        try:
            # one full 256-lane block is enough to beat the XLA scan
            return jax.devices()[0].platform == "tpu" and nwalkers >= 256
        except Exception:
            return False

    def _pallas_girsanov_eligible(self, nwalkers: int) -> bool:
        """Biased propagation runs inside the fused VMEM kernel
        (``md/pallas_md.aboba_girsanov_fused``) when the bias is an
        ``optcontrol`` chi-MLP over all-pairs features and the system fits
        the trajectory kernel (small, unconstrained, non-periodic).  The
        chi weights and the per-generation scalars stay runtime inputs, so
        adaptive Girsanov loops reuse one compiled program."""
        from ..features import FeaturesAll
        spec = getattr(self.bias, "optcontrol_spec", None)
        if spec is None or not isinstance(spec["featurizer"], FeaturesAll):
            return False
        model = spec["model"]
        npairs = self.natoms * (self.natoms - 1) // 2
        if (model.sizes[0] != npairs or model.sizes[-1] != 1
                or model.activation != "sigmoid"
                or model.lastactivation != "identity"):
            return False
        if self.system.implicit is not None or self.constraint_set is not None:
            return False
        from ..md.vsites import has_vsites
        if has_vsites(self.system):
            return False
        if self.natoms > 64:
            return False
        try:
            return jax.devices()[0].platform == "tpu" and nwalkers >= 256
        except Exception:
            return False

    def _force_path_has_pallas(self, nwalkers: int) -> bool:
        """True when the propagation program would embed a Mosaic kernel:
        the fused trajectory/Girsanov kernels, the GB force kernel, or the
        neighbor-engine sweep kernel (sparse systems on TPU)."""
        if self._pallas_eligible(nwalkers) or self._nb_kernel_eligible():
            return True
        if (self.bias is not None
                and self._pallas_girsanov_eligible(nwalkers)):
            return True
        if not self.system.dense_pairs:
            try:
                return jax.devices()[0].platform == "tpu"
            except Exception:
                return False
        return False

    def _propagate_fn(self, nwalkers: int, nsteps: int, biased: bool):
        if biased and self._pallas_girsanov_eligible(nwalkers):
            return self._girsanov_fused_fn(nwalkers, nsteps)
        # biased closures capture the bias object: key on its identity so
        # replacing sim.bias (e.g. a fresh optcontrol every generation)
        # cannot serve a stale program.  (The cached closure keeps the old
        # bias alive, so its id() cannot be recycled while cached.)
        key_ = ("prop", nwalkers, nsteps, biased, self.integrator,
                self._pallas_eligible(nwalkers), self.neighbor_mode,
                id(self.bias) if biased else None)
        if key_ in self._jit_cache:
            return self._jit_cache[key_]
        if biased:
            # evict programs compiled for previous bias objects (any walker
            # bucket): adaptive Girsanov loops refresh the bias every
            # generation, and each stale entry pins a whole compiled
            # trajectory program (and the bias closure) forever
            for k in [k for k in self._jit_cache
                      if isinstance(k, tuple) and len(k) == 8
                      and k[0] == "prop" and k[3] and k[7] != key_[7]]:
                del self._jit_cache[k]
        force_fn = self._force_fn()
        masses3, T, gamma, dt = self.masses3, self.temp, self.friction, self.step
        bias = self.bias
        cset = self.constraint_set

        if not biased and self._pallas_eligible(nwalkers):
            from ..md.pallas_md import langevin_middle_fused
            system = self.system
            block = 256
            pad = (-nwalkers) % block

            @jax.jit
            def run(x0, key):
                kv, ki = jax.random.split(key)
                if pad:
                    x0p = jnp.concatenate(
                        [x0, jnp.tile(x0[-1:], (pad, 1))], axis=0)
                else:
                    x0p = x0
                v0 = I.maxwell_boltzmann(kv, masses3, T, x0p.shape)
                x, v = langevin_middle_fused(system, x0p, v0, T, gamma, dt,
                                             nsteps, ki, block=block)
                return x[:nwalkers]

            self._jit_cache[key_] = run
            return run

        if (not biased and self.integrator == "langevin"
                and self.neighbor_mode == "verlet"
                and not self.system.dense_pairs):
            from ..md.verlet import VerletPlan, langevin_middle_verlet
            if getattr(self, "_vplan", None) is None:
                self._vplan = VerletPlan(
                    self.system, x0=np.asarray(self._x0).reshape(-1, 3),
                    skin=self.skin)
            vp = self._vplan
            system = self.system
            # class-c fault mitigation (docs/v5e_fault_report.md): bound
            # the per-program device work — the 7.7k-atom 8-walker
            # 100-step verlet program crashed the v5e worker at runtime
            # (2026-08-19) while each rebuild-block is harmless.  Step
            # chunking alone is NOT enough: the verlet footprint scales
            # with walkers*atoms*K per STEP (lists + per-pair force
            # buffers live simultaneously), and the full-scale run
            # crashed even at 32-step programs (verletperf2-5 logs).  So
            # the walker axis is chunked too: each program sees at most
            # ``ISOKANN_VERLET_WALKER_ATOMS_PER_PROGRAM`` walker-atoms,
            # the last chunk padded to the chunk width so only two step
            # programs exist.  (x, v) carry across host dispatches, so
            # the dynamics is identical to the fused program.
            import os as _os
            vcap = int(_os.environ.get(
                "ISOKANN_VERLET_ATOM_STEPS_PER_PROGRAM", 2_000_000))
            wcap = int(_os.environ.get(
                "ISOKANN_VERLET_WALKER_ATOMS_PER_PROGRAM", 16_384))
            natoms = int(system.natoms)
            W = max(1, min(nwalkers, wcap // max(1, natoms)))
            R = int(vp.rebuild_every)
            raw = max(1, vcap // max(1, W * natoms))
            chunk = max(R, (raw // R) * R) if raw >= R else R
            cores = {}

            def _core(n_sub):
                if n_sub not in cores:
                    @jax.jit
                    def core(x0, v0, key):
                        x, v, diag = langevin_middle_verlet(
                            system, vp, x0, v0, masses3, T, gamma, dt,
                            n_sub, key, constraints=cset)
                        return x, v, diag["max_disp"], diag["n_over"]
                    cores[n_sub] = core
                return cores[n_sub]

            def run(x0, key):
                max_disp, n_over = 0.0, 0
                outs = []
                for s0 in range(0, nwalkers, W):
                    sub = x0[s0:s0 + W]
                    npad = W - sub.shape[0]
                    if npad:
                        sub = jnp.concatenate(
                            [sub, jnp.tile(sub[-1:], (npad, 1))], axis=0)
                    key, kv = jax.random.split(key)
                    v = I.maxwell_boltzmann(kv, masses3, T, sub.shape)
                    x = sub
                    left = int(nsteps)
                    while left > 0:
                        n_sub = min(chunk, left)
                        key, ki = jax.random.split(key)
                        x, v, md, no = _core(n_sub)(x, v, ki)
                        max_disp = max(max_disp, float(md))
                        n_over = max(n_over, int(no))
                        left -= n_sub
                    outs.append(x[:W - npad] if npad else x)
                x = outs[0] if len(outs) == 1 else jnp.concatenate(outs, 0)
                if int(n_over) or float(max_disp) > vp.skin / 2:
                    import warnings
                    warnings.warn(
                        f"verlet lists degraded: overflow {int(n_over)} "
                        f"atoms, max per-block displacement "
                        f"{float(max_disp):.3f} nm vs skin/2 "
                        f"{vp.skin / 2:.3f} — forces of this propagation "
                        f"may be inexact; raise K/skin or lower "
                        f"rebuild_every")
                return x

            self._jit_cache[key_] = run
            return run

        if biased:
            @jax.jit
            def run(x0, key):
                kv, ki = jax.random.split(key)
                p0 = jax.random.normal(kv, x0.shape, x0.dtype) * jnp.sqrt(
                    masses3 * I.KB * T)
                q, p, logw = I.aboba_girsanov(force_fn, bias, x0, p0, masses3,
                                              T, gamma, dt, nsteps, ki,
                                              constraints=cset)
                return q, jnp.exp(logw)
        elif self.integrator == "brownian":
            @jax.jit
            def run(x0, key):
                return I.brownian(force_fn, x0, masses3, T, gamma, dt,
                                  nsteps, key)
        else:
            @jax.jit
            def run(x0, key):
                kv, ki = jax.random.split(key)
                v0 = I.maxwell_boltzmann(kv, masses3, T, x0.shape)
                x, v = I.langevin_middle(force_fn, x0, v0, masses3, T, gamma,
                                         dt, nsteps, ki, constraints=cset)
                return x

        self._jit_cache[key_] = run
        return run

    def _girsanov_fused_fn(self, nwalkers: int, nsteps: int):
        """Biased propagation through the fused VMEM Girsanov kernel.  The
        compiled program is keyed on the static model spec only; chi
        weights and the per-generation (b, qrate, Tmax) scalars are read
        from the *current* ``self.bias`` at every call, so optcontrol
        refreshes between generations hit the same executable."""
        spec0 = self.bias.optcontrol_spec
        mspec = spec0["model"]
        key_ = ("prop_girsanov", nwalkers, nsteps, mspec.sizes,
                mspec.layernorm, float(spec0["forcescale"]))
        if key_ not in self._jit_cache:
            from ..md.pallas_md import aboba_girsanov_fused
            system = self.system
            masses3, T, gamma, dt = (self.masses3, self.temp, self.friction,
                                     self.step)
            fs = float(spec0["forcescale"])

            @jax.jit
            def core(x0, key, params, b, qrate, tmax):
                kv, ki = jax.random.split(key)
                p0 = jax.random.normal(kv, x0.shape, x0.dtype) * jnp.sqrt(
                    masses3 * I.KB * T)
                q, p, logw = aboba_girsanov_fused(
                    system, x0, p0, T, gamma, dt, nsteps, ki, mspec,
                    params=params, forcescale=fs, b=b, qrate=qrate,
                    Tmax=tmax, block=256)
                return q, jnp.exp(logw)

            self._jit_cache[key_] = core

        core = self._jit_cache[key_]
        getbias = lambda: self.bias.optcontrol_spec

        def run(x0, key):
            spec = getbias()
            return core(x0, key, spec["model"].params,
                        jnp.float32(spec["b"]), jnp.float32(spec["qrate"]),
                        jnp.float32(spec["Tmax"]))

        return run

    # Per-program walker-step budget for step-scanned programs embedding
    # the Pallas GB kernel: on the 2026-08 v5e runtime such programs
    # crash the TPU worker above roughly 2.5e6 walker-steps (lower when
    # the process has accumulated device state), while every probe at or
    # below ~1e6 passes — tools/repro_v5e_faults.py --gb and
    # docs/v5e_fault_report.md class (c).  Propagations above the budget
    # are host-chunked into equal sub-batches (one compile).
    _GB_SCAN_WORK_CAP = 1_000_000

    def _scan_work_cap(self):
        if not self._nb_kernel_eligible():
            return None
        import os
        return int(os.environ.get("ISOKANN_MAX_PROGRAM_WALKER_STEPS",
                                  self._GB_SCAN_WORK_CAP))

    def propagate(self, x0, nk, key=None, steps=None):
        """(n, 3N) -> (n, nk, 3N) Koopman burst propagation — one jitted
        device program for all n*nk walkers (replaces the reference's serial
        loop ``src/simulators/openmm.jl:286-315``).  With a bias, returns
        Girsanov-weighted samples."""
        key = _key(key)
        x0 = jnp.asarray(x0)
        n, d = x0.shape
        nsteps = self.steps if steps is None else steps
        cap = self._scan_work_cap()
        if cap is not None and n > 1 and n * nk * nsteps > cap:
            # NOTE: WeightedSamples comes from the module import — a
            # local import here would shadow it for the whole function
            # and break the biased return path below
            rows = max(1, cap // (nk * nsteps))
            if rows > 1:          # same compiled bucket for every chunk
                rows = 1 << (rows.bit_length() - 1)
            parts = [(i, min(i + rows, n)) for i in range(0, n, rows)]
            keys = jax.random.split(key, len(parts))
            outs = [self.propagate(x0[a:b], nk, key=k, steps=nsteps)
                    for (a, b), k in zip(parts, keys)]
            if isinstance(outs[0], WeightedSamples):
                return WeightedSamples(
                    jnp.concatenate([o.values for o in outs], axis=0),
                    jnp.concatenate([o.weights for o in outs], axis=0))
            return jnp.concatenate(outs, axis=0)
        import os as _os
        scap = int(_os.environ.get("ISOKANN_PROP_STEPS_PER_PROGRAM",
                                   150_000))
        if self.bias is None and nsteps > scap:
            # very long lags (e.g. implied-timescale ladder extensions)
            # host-stage through the block program: single-scan programs
            # are validated to ~1.5e5 steps on the current v5e runtime
            # (class-c faults above, docs/v5e_fault_report.md)
            return self._propagate_staged(x0, nk, key, nsteps, scap)
        xs = jnp.repeat(x0, nk, axis=0)
        # bucket the walker count to the next power of two: adaptive
        # sampling loops call propagate with ever-changing batch sizes,
        # and every new shape is a fresh (remote, minutes-slow) compile —
        # padding confines them to O(log n) shape families
        nw = n * nk
        bucket = max(8, 1 << (nw - 1).bit_length())
        if bucket != nw:
            xs = jnp.concatenate(
                [xs, jnp.tile(xs[-1:], (bucket - nw, 1))], axis=0)
        run = self._propagate_fn(bucket, nsteps, self.bias is not None)
        from ..parallel import device_count as _mesh_device_count
        if (_mesh_device_count() > 1 and jax.process_count() == 1
                and bucket % _mesh_device_count() == 0
                and not self._force_path_has_pallas(bucket)):
            # multi-chip: walker-shard the batch; the propagation is
            # embarrassingly parallel, so GSPMD partitions the program
            # with zero collectives.  Any program containing a Mosaic
            # kernel stays single-device (not SPMD-partitionable), and
            # multi-host runs feed per-host data explicitly
            # (parallel.distributed.host_local_batch).
            from ..parallel import make_mesh, shard_batch
            xs = shard_batch(make_mesh(), xs)
        from ..md.vsites import place_vsites_flat
        if self.bias is not None:
            ys, w = run(xs, key)
            self._check_cell_overflow(ys[:nw])
            ys = place_vsites_flat(self.system, ys[:nw])
            return WeightedSamples(ys.reshape(n, nk, d),
                                   w[:nw].reshape(n, nk))
        ys = run(xs, key)[:nw]
        # failure handling: retry diverged walkers with fresh noise, then
        # fall back to their start state (reference retries PyExceptions and
        # NaN-fills failures, src/simulators/openmm.jl:286-315,
        # mopenmm.py:139-143)
        for _ in range(3):
            bad = ~jnp.all(jnp.isfinite(ys), axis=-1)
            if not bool(jnp.any(bad)):
                break
            key, sub = jax.random.split(key)
            retry = run(xs, sub)[:nw]
            ys = jnp.where(bad[:, None], retry, ys)
        bad = ~jnp.all(jnp.isfinite(ys), axis=-1)
        if bool(jnp.any(bad)):
            import warnings
            warnings.warn(f"{int(jnp.sum(bad))} walkers diverged after "
                          f"retries; falling back to their start states")
            ys = jnp.where(bad[:, None], xs[:nw], ys)
        self._check_cell_overflow(ys)
        return place_vsites_flat(self.system, ys).reshape(n, nk, d)

    def _propagate_staged(self, x0, nk, key, nsteps, scap):
        """Koopman bursts at very long lags, staged through the block
        trajectory program: the lag is split into ceil(nsteps/scap)
        equal-length host dispatches of ONE compiled block with (x, v)
        carried across, so the dynamics equals the single-scan program
        (velocities Maxwell-Boltzmann-drawn once at the lag start, as
        in `_propagate_fn`) while per-program device work stays within
        the class-c fault bound (docs/v5e_fault_report.md).  Unbiased
        only: Girsanov weights accumulate inside the scan, and the lag
        tools that need these lags never run biased."""
        from ..md.vsites import place_vsites_flat

        n, d = x0.shape
        xs = jnp.repeat(jnp.asarray(x0), nk, axis=0)
        nw = n * nk
        bucket = max(8, 1 << (nw - 1).bit_length())
        if bucket != nw:
            xs = jnp.concatenate(
                [xs, jnp.tile(xs[-1:], (bucket - nw, 1))], axis=0)
        nseg = -(-nsteps // scap)
        seg = -(-nsteps // nseg)               # balanced segments
        rem = nsteps - seg * (nseg - 1)        # last segment (<= seg)
        kv, kr = jax.random.split(key)
        x = xs
        v = I.maxwell_boltzmann(kv, self.masses3, self.temp, xs.shape)
        keys = jax.random.split(kr, nseg)
        block = self._block_fn(bucket, seg, resample_velocities=False)
        for k in keys[:-1]:
            x, v = block(x, v, k)
        last = (block if rem == seg
                else self._block_fn(bucket, rem, False))
        x, _ = last(x, v, keys[-1])
        ys = x[:nw]
        bad = ~jnp.all(jnp.isfinite(ys), axis=-1)
        if bool(jnp.any(bad)):
            import warnings
            warnings.warn(
                f"{int(jnp.sum(bad))} walkers diverged in staged long-lag "
                f"propagation; falling back to their start states")
            ys = jnp.where(bad[:, None], xs[:nw], ys)
        self._check_cell_overflow(ys)
        return place_vsites_flat(self.system, ys).reshape(n, nk, d)

    def _check_cell_overflow(self, ys, sample: int = 8):
        """Neighbor-engine safety net: the cell capacity is sized from the
        start coordinates; density drift that overflows a cell silently
        drops interactions.  Host-side occupancy check on a bounded frame
        sample after each propagation (overflow is a collective density
        phenomenon — a few frames catch it); on overflow the plan regrows
        from the offending frame and the cached programs that baked it in
        are evicted (the *returned* samples carried degraded forces — warn
        loudly)."""
        plan = getattr(self, "_nbplan", None)
        if plan is None or self.system.dense_pairs:
            return
        xf = np.asarray(ys).reshape(-1, self.dim)[:sample]
        finite = np.all(np.isfinite(xf), axis=1)
        if not finite.any():
            return                 # divergence is handled by the caller
        xf = xf[finite]
        dropped = plan.overflow(xf)
        if dropped:
            import warnings
            from ..md.neighbor import NeighborPlan
            self._nbplan = NeighborPlan(
                self.system, x0=xf[0].reshape(-1, 3), margin=2.0,
                cell_div=plan.cell_div)
            self._jit_cache = {k: v for k, v in self._jit_cache.items()
                               if not (isinstance(k, tuple) and k
                                       and k[0] in ("prop", "prop_girsanov",
                                                    "bootstrap", "block"))}
            warnings.warn(
                f"neighbor cell overflow ({dropped} atoms dropped): forces "
                f"of this propagation were degraded; cell capacity regrown "
                f"{plan.C} -> {self._nbplan.C} for subsequent calls")

    # ---- fused data generation --------------------------------------------

    def bootstrap_data(self, nx: int, nk: int, featurizer=None, key=None,
                       chains: int = None, burnin: int = None):
        """Fused dataset bootstrap: ONE jitted program computing
        - nx lagged frames sampled by ``chains`` independent lagged chains
          from the default state (randx0 semantics),
        - nk Koopman bursts per frame,
        - features of both.
        Returns (xs, ys, fxs, fys).  This replaces three separately
        compiled programs (chain, bursts, featurize) — compile latency is
        the dominant non-physics cost under remote-compiled TPU backends.

        ``chains`` (default: the largest divisor of nx up to 8 that keeps
        every chain at >= 4 lags of burn-in depth): a single lagged chain
        is nx * steps *sequential* integrator steps — the wall-clock
        bottleneck of the whole bootstrap.  Independent chains (each with
        its own thermal noise and per-lag velocity resampling, all
        starting from the default state) run chains-way parallel.

        ``burnin`` (lag frames discarded per chain before collection;
        default ``nlag * (chains - 1) // 2``): matches the *mean*
        equilibration depth of the reference's single nx-lag chain
        (mean lag (nx+1)/2), so multi-chain statistics are not drawn from
        a less-equilibrated distribution than reference semantics.
        ``chains=1`` (burnin 0) reproduces the reference's
        single-trajectory semantics exactly."""
        key = _key(key)
        featurizer = featurizer or self.featurizer
        if chains is None:
            # largest divisor of nx up to 8 that still leaves each chain
            # >= 4 lags of burn-in depth
            chains = max((d for d in range(1, 9)
                          if nx % d == 0 and nx // d >= 4), default=1)
        if nx % chains != 0:
            raise ValueError(f"chains={chains} must divide nx={nx}")
        if burnin is None:
            burnin = (nx // chains) * (chains - 1) // 2
        if (nx // chains + burnin) * self.steps > self._BOOTSTRAP_FUSED_MAX:
            return self._bootstrap_staged(nx, nk, featurizer, key, chains,
                                          burnin)
        cache_key = ("bootstrap", nx, nk, self.steps, chains, burnin,
                     id(featurizer))
        if cache_key not in self._jit_cache:
            force_fn = self._force_fn()
            masses3, T, gamma, dt = (self.masses3, self.temp, self.friction,
                                     self.step)
            nsteps = self.steps
            cset = self.constraint_set
            nlag = nx // chains
            ntotal = nlag + burnin

            @jax.jit
            def run(x0, key):
                kchain, kprop = jax.random.split(key)

                # flat single-level chain scan: velocities are resampled
                # every `nsteps` steps via a where-mask (nested scans
                # compile an order of magnitude slower on remote-compiled
                # TPU backends)
                def chainstep(carry, inp):
                    x, v, i, buf = carry
                    k = inp
                    kv, k2 = jax.random.split(k)
                    vnew = I.maxwell_boltzmann(kv, masses3, T, x.shape)
                    v = jnp.where(i % nsteps == 0, vnew, v)
                    x, v = I.langevin_middle_step(force_fn, x, v, masses3,
                                                  T, gamma, dt, k2,
                                                  constraints=cset)
                    # write into the current lag slot; the last write of
                    # each lag window leaves the lag frame.  A per-step
                    # stacked scan output would materialize EVERY
                    # integrator step — (ntotal*nsteps, chains, 3N) is
                    # 38 GB for villin at the reference 1e4-step lag
                    # (compile-time HBM OOM); the carry buffer holds only
                    # the (ntotal, chains, 3N) lag frames
                    buf = jax.lax.dynamic_update_slice(
                        buf, x[None], (i // nsteps, 0, 0))
                    return (x, v, i + 1, buf), None

                keys = jax.random.split(kchain, ntotal * nsteps)
                x0b = jnp.tile(x0[None, :], (chains, 1))
                v0 = jnp.zeros_like(x0b)
                buf0 = jnp.zeros((ntotal,) + x0b.shape, x0b.dtype)
                (_, _, _, traj), _ = jax.lax.scan(
                    chainstep, (x0b, v0, 0, buf0), keys)
                # (ntotal, chains, 3N) lag frames; drop the burn-in
                # prefix, then -> (nx, 3N), chain-major
                xs = jnp.swapaxes(traj[burnin:], 0, 1).reshape(nx, -1)

                kv, ki = jax.random.split(kprop)
                yr = jnp.repeat(xs, nk, axis=0)
                v0 = I.maxwell_boltzmann(kv, masses3, T, yr.shape)
                ys, _ = I.langevin_middle(force_fn, yr, v0, masses3, T,
                                          gamma, dt, nsteps, ki,
                                          constraints=cset)
                ys = ys.reshape(nx, nk, -1)
                fxs = jnp.asarray(featurizer(xs), jnp.float32)
                fys = jnp.asarray(featurizer(ys), jnp.float32)
                return xs, ys, fxs, fys

            self._jit_cache[cache_key] = run
        out = self._jit_cache[cache_key](self._x0, key)
        if not bool(jnp.all(jnp.isfinite(out[0]))):
            raise FloatingPointError(
                "dataset bootstrap diverged (non-finite coordinates): the "
                "initial structure appears unstable at this timestep — "
                "construct the simulation with minimize=True or a smaller "
                "`step`")
        return out

    # Round-1 validated the fused single-program bootstrap to ~1.4e5
    # chain-scan steps (villin-scale at 2500-step lags); at the
    # reference 1e4-step villin lag the same program (6.7e5-step scan)
    # compiles but crashes the v5e TPU worker during execution
    # (2026-08-19).  Above this, the bootstrap stages through the block
    # trajectory program instead.
    _BOOTSTRAP_FUSED_MAX = 150_000

    def _bootstrap_staged(self, nx, nk, featurizer, key, chains, burnin):
        """Host-staged dataset bootstrap for long lags: ``ntotal`` host
        dispatches of one (chains, 3N) lag-block program (velocities
        resampled at every lag start, as in the fused program), then one
        standard Koopman-burst propagation.  A few extra dispatches
        (tens of ms each through the tunnel) buy bounded per-program
        device time, which the current v5e runtime requires at the
        villin reference lag."""
        nlag = nx // chains
        ntotal = nlag + burnin
        nsteps = self.steps
        kchain, kprop = jax.random.split(key)
        block = self._block_fn(chains, nsteps, resample_velocities=True)
        x = jnp.tile(jnp.asarray(self._x0)[None, :], (chains, 1))
        v = jnp.zeros_like(x)
        frames = []
        for k in jax.random.split(kchain, ntotal):
            x, v = block(x, v, k)
            frames.append(np.asarray(x))
        xs = np.swapaxes(np.stack(frames[burnin:], axis=0), 0,
                         1).reshape(nx, -1)          # chain-major (nx, 3N)
        if not np.isfinite(xs).all():
            raise FloatingPointError(
                "dataset bootstrap diverged (non-finite coordinates): the "
                "initial structure appears unstable at this timestep — "
                "construct the simulation with minimize=True or a smaller "
                "`step`")
        xs = jnp.asarray(xs)
        # Koopman bursts through the standard propagate program (shared
        # with the campaign's resampling — no extra executable); the
        # bootstrap is always unbiased, like the fused program
        bias, self.bias = self.bias, None
        try:
            ys = self.propagate(xs, nk, key=kprop)
        finally:
            self.bias = bias
        fxs = jnp.asarray(featurizer(xs), jnp.float32)
        fys = jnp.asarray(featurizer(ys), jnp.float32)
        return xs, ys, fxs, fys

    # ---- trajectories ------------------------------------------------------

    def _block_fn(self, batch: int, saveevery: int, resample_velocities: bool):
        """One jitted trajectory block: advance (batch, 3N) by ``saveevery``
        steps.  Trajectories host-loop over this single program — one
        compile regardless of trajectory length, bounded memory."""
        key_ = ("block", batch, saveevery, resample_velocities)
        if key_ in self._jit_cache:
            return self._jit_cache[key_]
        force_fn = self._force_fn()
        masses3, T, gamma, dt = self.masses3, self.temp, self.friction, self.step
        cset = self.constraint_set

        @jax.jit
        def block(x, v, k):
            if resample_velocities:
                kv, k = jax.random.split(k)
                v = I.maxwell_boltzmann(kv, masses3, T, x.shape)
            x, v = I.langevin_middle(force_fn, x, v, masses3, T, gamma,
                                     dt, saveevery, k, constraints=cset)
            return x, v

        self._jit_cache[key_] = block
        return block

    def trajectory(self, steps=None, saveevery=1, x0=None,
                   sample_velocities=True, resample_velocities=False,
                   key=None):
        """(nsave, 3N) trajectory (reference ``src/simulators/openmm.jl:356-393``).

        With a bias attached, runs the Girsanov ABOBA integrator and returns
        WeightedSamples (reference ``langevin_girsanov!`` dispatch :546)."""
        key = _key(key)
        steps = self.steps if steps is None else steps
        x0 = self._x0 if x0 is None else jnp.asarray(x0).reshape(-1)
        nblocks = steps // saveevery
        if self.bias is not None:
            force_fn = self._force_fn()
            kv, ki = jax.random.split(key)
            p0 = jax.random.normal(kv, (1, self.dim)) * jnp.sqrt(
                self.masses3 * KB * self.temp)
            qs, logws, _ = I.aboba_girsanov(
                force_fn, self.bias, x0[None, :], p0, self.masses3, self.temp,
                self.friction, self.step, steps, ki, save_every=saveevery,
                constraints=self.constraint_set)
            self._check_cell_overflow(qs[:, 0, :], sample=16)
            from ..md.vsites import place_vsites_flat
            return WeightedSamples(place_vsites_flat(self.system, qs[:, 0, :]),
                                   jnp.exp(logws[:, 0]))
        block = self._block_fn(1, saveevery, resample_velocities)
        kv, key = jax.random.split(key)
        x = x0[None, :]
        v = (jnp.zeros_like(x) if not sample_velocities
             else I.maxwell_boltzmann(kv, self.masses3, self.temp, x.shape))
        saves = []
        for k in jax.random.split(key, nblocks):
            x, v = block(x, v, k)
            if not bool(jnp.all(jnp.isfinite(x))):
                # partial-result recovery (reference trajectory catches
                # failures and returns the frames so far,
                # src/simulators/openmm.jl:384-391)
                import warnings
                warnings.warn(f"trajectory diverged after {len(saves)} of "
                              f"{nblocks} frames; returning partial result")
                break
            saves.append(x[0])
        if not saves:
            raise FloatingPointError(
                "trajectory diverged immediately; minimize the structure or "
                "reduce the timestep")
        out = jnp.stack(saves)
        # check every saved frame: mid-run density drift may relax again
        self._check_cell_overflow(out, sample=len(saves))
        from ..md.vsites import place_vsites_flat
        return place_vsites_flat(self.system, out)

    def laggedtrajectory(self, lags, steps=None, x0=None,
                         resample_velocities=True, key=None):
        """lags frames separated by ``steps`` integrator steps, velocities
        resampled per lag (reference ``src/simulators/openmm.jl:333``)."""
        steps = self.steps if steps is None else steps
        return self.trajectory(steps=lags * steps, saveevery=steps, x0=x0,
                               resample_velocities=resample_velocities,
                               key=key)

    def randx0(self, n, key=None):
        """n initial points from a lagged trajectory
        (reference ``src/simulators/openmm.jl:273``).  With a bias attached
        the Girsanov weights of the warmup trajectory are discarded
        (reference ``randx0(sim, nx) = values(laggedtrajectory(...))``)."""
        from ..data import values
        return values(self.laggedtrajectory(n, key=key))

    # ---- direct integrator access (reference module-level functions,
    #      src/simulators/openmm.jl:440-637) -------------------------------

    def integrate_langevin(self, x0=None, steps=None, perturbation=None,
                           key=None):
        """Underdamped EM integration with optional force perturbation
        (reference ``integrate_langevin`` :440-464)."""
        key = _key(key)
        x0 = jnp.atleast_2d(self._x0 if x0 is None else jnp.asarray(x0))
        steps = self.steps if steps is None else steps
        kv, ki = jax.random.split(key)
        v0 = I.maxwell_boltzmann(kv, self.masses3, self.temp, x0.shape)
        x, v = I.langevin_em(self._force_fn(), x0, v0, self.masses3,
                             self.temp, self.friction, self.step, steps, ki,
                             perturbation=perturbation)
        return x

    def integrate_girsanov(self, x0=None, steps=None, bias=None, key=None):
        """Overdamped EM with Girsanov weights; returns (x, logw)
        (reference ``integrate_girsanov`` :510-536)."""
        key = _key(key)
        x0 = jnp.atleast_2d(self._x0 if x0 is None else jnp.asarray(x0))
        steps = self.steps if steps is None else steps
        bias = bias or self.bias
        return I.brownian_girsanov(self._force_fn(), bias, x0, self.masses3,
                                   self.temp, self.friction, self.step,
                                   steps, key)

    def langevin_girsanov(self, x0=None, steps=None, bias=None, saveevery=1,
                          sigmascaled=True, key=None):
        """Underdamped ABOBA with Girsanov reweighting; returns
        WeightedSamples of the saved frames
        (reference ``langevin_girsanov!`` :569-637)."""
        key = _key(key)
        x0 = jnp.asarray(self._x0 if x0 is None else x0).reshape(-1)
        steps = self.steps if steps is None else steps
        bias = bias or self.bias or (lambda q, t, sigma, F: jnp.zeros_like(q))
        kv, ki = jax.random.split(key)
        p0 = jax.random.normal(kv, (1, self.dim)) * jnp.sqrt(
            self.masses3 * KB * self.temp)
        qs, logws, _ = I.aboba_girsanov(
            self._force_fn(), bias, x0[None, :], p0, self.masses3, self.temp,
            self.friction, self.step, steps, ki, save_every=saveevery,
            sigmascaled=sigmascaled, constraints=self.constraint_set)
        return WeightedSamples(qs[:, 0, :], jnp.exp(logws[:, 0]))

    def __repr__(self):
        return (f"MDSimulation({self.natoms} atoms, steps={self.steps}, "
                f"temp={self.temp}K, friction={self.friction}/ps, "
                f"dt={self.step}ps, {self.system.method})")


# Alias mirroring the reference name
OpenMMSimulation = MDSimulation


def _key(key):
    if key is None:
        return jax.random.PRNGKey(np.random.randint(0, 2**31 - 1))
    if isinstance(key, int):
        return jax.random.PRNGKey(key)
    return key
