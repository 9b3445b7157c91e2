from . import gaussian, resample, sampling, schedule
from .gaussian import DiffusionConfig, LossKind, MeanType, VarType
from .sampling import (ddim_sample_loop, ddim_sample_loop_progressive,
                       make_jit_sampler, p_sample_loop,
                       p_sample_loop_progressive)
from .schedule import DiffusionSchedule, make_schedule, space_timesteps
