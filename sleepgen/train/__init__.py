from sleepgen.train.train_aekl import AEKLState, train_aekl
from sleepgen.train.train_dm import train_dm
from sleepgen.train.train_ldm import DiffusionState, train_ldm

__all__ = ["AEKLState", "train_aekl", "DiffusionState", "train_ldm", "train_dm"]
