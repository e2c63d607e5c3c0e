from edgestyle_tpu.schedulers.ddpm import NoiseSchedule, DDPMScheduler
from edgestyle_tpu.schedulers.ddim import DDIMScheduler
from edgestyle_tpu.schedulers.dpmsolver import DPMSolverScheduler
from edgestyle_tpu.schedulers.lcm import LCMScheduler
from edgestyle_tpu.schedulers.unipc import UniPCScheduler
