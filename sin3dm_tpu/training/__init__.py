from . import ae, diffusion
from .ae import AETrainer, AETrainerConfig
from .diffusion import DiffusionTrainLoop, DiffusionTrainerConfig
