from edgestyle_tpu.training.prodigy import prodigy
from edgestyle_tpu.training.minsnr import min_snr_weights
