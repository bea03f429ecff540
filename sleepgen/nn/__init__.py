from sleepgen.nn.aekl import AutoencoderKL
from sleepgen.nn.discriminator import DiscriminatorV1, PatchDiscriminator
from sleepgen.nn.unet1d import UNet1d
from sleepgen.nn.usleep import USleep

__all__ = [
    "AutoencoderKL",
    "DiscriminatorV1",
    "PatchDiscriminator",
    "UNet1d",
    "USleep",
]
