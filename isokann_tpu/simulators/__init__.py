from .base import IsoSimulation, ExternalSimulation
from .langevin import Diffusion, Doublewell, Triplewell, MuellerBrown
