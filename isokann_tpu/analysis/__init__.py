from .reactivepath import (
    reactive_path, save_reactive_path, shortestchain, shortestpath,
    bellman_ford_dense, QuantilePath, FromToPath, FullPath, MaxPath, dtmask,
)
from .minimumpath import (
    reactionpath_minimum, reactionpath_ode, reactionforce,
    energyminimization_chilevel, minimize_levelset,
)
from .mutualinformation import kde_mi, mutual_information
from .msm import (
    ulam_transition_matrix, koopman_eigenfunctions, grid_assign,
    eigenfunction_on_samples, implied_timescale, chi_msm_correlation,
    ramachandran_msm, disconnected_trajectories, containment_R,
    subspace_spectrum,
)
from .freeenergy import (
    marginal_free_energy, constrained_free_energy, local_mean_force,
    integrate_chi, delta_G, sample_uniform_chi_coords,
)
from .committor import committor_system, solve_committor
