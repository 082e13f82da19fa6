from .pairdists import (
    sqpairdist, pairdist, flatpairdists, halfinds, pdists,
    localpdistinds, restricted_localpdistinds, localpdists,
)
from .align import (
    kabsch_rotation, align, aligned_rmsd, pairwise_aligned_rmsd,
    aligntrajectory, centered, aligned_rmsd_one_to_many,
)
from .dihedrals import dihedral, phi_psi_indices, dihedrals_from_indices
