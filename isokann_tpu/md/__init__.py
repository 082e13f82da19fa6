from .pdbio import read_pdb, write_pdb, write_pdb_traj, PDBStructure
from .topology import Topology, Residue, build_topology
from .system import MDSystem, build_system
from . import forces, integrators, amber
from .minimize import minimize_energy
