"""isokann_tpu — a TPU-native ISOKANN framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the reference
ISOKANN.jl package (learning Koopman invariant-subspace membership functions
chi of stochastic/molecular dynamics), designed TPU-first:

- simulators are pure functions vmapped over walkers (one device program
  propagates every walker; the reference used threaded per-walker loops),
- the training episode (Koopman forward, shift-scale target, minibatch SGD)
  is a single fused jitted ``lax.scan``,
- multi-chip scaling shards walkers and batches over a ``jax.sharding.Mesh``
  (see ``isokann_tpu.parallel``),
- molecular dynamics (Amber-type force field, Langevin/BAOAB/Girsanov
  integrators) runs batched on-device (see ``isokann_tpu.md``).

Array convention: batch-leading.  xs: (n, d), Koopman samples ys: (n, k, d),
features (n, f) / (n, k, f), chi (n, nchi).
"""

__version__ = "0.1.0"

from .models import MLP, autonet, pairnet, densenet, smallnet, growmodel
from .optim import AdamRegularized, NesterovRegularized
from .targets import (
    DomainError,
    TransformShiftscale, TransformISA, TransformPseudoInv, Stabilize,
    TransformGramSchmidt, TransformLeftRight, TransformLeftRightHistory,
    TransformSVD, TransformSVDRev, TransformPinv, TransformCross,
    shiftscale, expectation, isotarget, koopman,
    residual_linear, residual_ritz, residual_subspace,
)
from .data import (
    SimulationData, WeightedSamples,
    bootstrap, data_from_trajectory, data_from_trajectories,
    subsample, subsample_inds, mergedata, addcoords,
    resample_kde, resample_strat,
    trajectorydata_linear, trajectorydata_bursts,
    exportdata, exportsorted,
)
from .iso import (
    Iso, run, run_kde, chis, chicoords,
    FunctionLogger, ValidationLogger, ValidationLossLogger, validationloss,
    rates, chi_exit_rate, simulationtime, save, load,
)
from .sample import (
    subsample_uniformgrid, pickclosest, resample_kde_ash, kde_needles,
    picking, picking_aligned, extrapolate, addextrapolates, dchidx,
)
from .simulators import (
    IsoSimulation, ExternalSimulation,
    Diffusion, Doublewell, Triplewell, MuellerBrown,
    MDSimulation, OpenMMSimulation,
)
from .features import (
    FeaturesAll, FeaturesCoords, FeaturesAtoms, FeaturesPairs,
    FeaturesAngles, FeaturesRandomPairs,
)
from .ops import (
    flatpairdists, pairdist, sqpairdist, pdists,
    align, aligned_rmsd, pairwise_aligned_rmsd, aligntrajectory,
    dihedral, localpdistinds, restricted_localpdistinds,
)
# the reference re-exports its OpenMM wrapper module (src/ISOKANN.jl:56);
# the counterpart here is the MD simulation module
from .simulators import mdsim as OpenMM
from .simulators.metadynamics import (
    MetadynamicsSimulation, MetadynamicsState, MetadynamicsStateGridded,
)
from .simulators.bridge import (
    GuidedLangevinBridge, LinearInterpolant, bridge_simplex, run_bridges,
    resample_picking_features,
)
from .simulators.effective import EffectiveSimulation, KDEExpectation
from .workflows import (
    run_metadynamics, adaptive_metadynamics, run_kde_dash, run_both,
    run_girsanov, lag_sweep, rates_resolved, cktest,
    training_lag_headroom, escalate_lag,
)
from .ensemble import ChiEnsemble, resample_uncertainty
from .analysis import (
    reactive_path, save_reactive_path, reactionpath_minimum, reactionpath_ode,
    marginal_free_energy, constrained_free_energy, mutual_information,
    solve_committor,
)
from .utils import (
    plot_training, plot_chi, scatter_ramachandran, autoplot,
    LazyTrajectory, LazyMultiTrajectory,
    savecoords, saveextrema, load_trajectory, save_trajectory,
    phi_psi, ca_rmsd, ReactionCoordsRMSD, standardform,
    serve_dashboard, livegui, interactive_gui,
)
from .md.fixtures import alanine_dipeptide_pdb
from .data import flattenfirst, flattenlast


# --- thin module-level conveniences mirroring the reference exports -------

def propagate(sim, xs, nk, key=None):
    """Module-level alias of ``sim.propagate`` (reference export)."""
    return sim.propagate(xs, nk, key=key)


def trajectory(sim, *args, **kwargs):
    """Module-level alias of ``sim.trajectory`` (reference export)."""
    return sim.trajectory(*args, **kwargs)


def laggedtrajectory(sim_or_data, n, **kwargs):
    """Module-level alias of ``.laggedtrajectory`` (reference export)."""
    return sim_or_data.laggedtrajectory(n, **kwargs)


def cpu(tree):
    """Move a pytree to host numpy (reference ``cpu`` export).  jax manages
    placement automatically; this exists for API familiarity."""
    import numpy as _np
    import jax as _jax
    return _jax.tree_util.tree_map(
        lambda x: _np.asarray(x) if isinstance(x, _jax.Array) else x, tree)


def device(tree, dev=None):
    """Move a pytree onto a device (reference ``gpu`` export analog)."""
    import jax as _jax
    dev = dev or _jax.devices()[0]
    return _jax.tree_util.tree_map(
        lambda x: _jax.device_put(x, dev) if hasattr(x, "shape") else x, tree)


gpu = device     # reference name


def atom_indices(pdb: str, selector: str = "all"):
    """Atom indices for a selector (reference ``atom_indices`` via mdtraj;
    selectors: 'all', 'heavy', 'name CA'/'calpha', 'backbone')."""
    from .features import _select_atoms
    from .md.pdbio import read_pdb
    return _select_atoms(read_pdb(pdb), selector)


# chemfile-style trajectory I/O aliases (reference readchemfile/writechemfile)
def readchemfile(path, frame=None):
    from .utils.save import load_trajectory
    traj = load_trajectory(path)
    return traj if frame is None else traj[frame]


def writechemfile(path, traj, top=None):
    from .utils.save import save_trajectory
    return save_trajectory(path, traj, top=top)
