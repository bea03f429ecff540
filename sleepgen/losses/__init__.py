from sleepgen.losses.adversarial import discriminator_adv_loss, generator_adv_loss
from sleepgen.losses.kl import kl_gaussian
from sleepgen.losses.spectral import fft_amplitude, jukebox_loss

__all__ = [
    "discriminator_adv_loss",
    "generator_adv_loss",
    "kl_gaussian",
    "fft_amplitude",
    "jukebox_loss",
]
