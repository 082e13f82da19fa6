from .base import IsoSimulation, ExternalSimulation
from .langevin import Diffusion, Doublewell, Triplewell, MuellerBrown
from .mdsim import MDSimulation, OpenMMSimulation
