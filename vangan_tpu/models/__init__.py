from vangan_tpu.models.discriminator import PatchGANDiscriminator3D  # noqa: F401
from vangan_tpu.models.resnet_generator import ResNetGenerator3D  # noqa: F401
from vangan_tpu.models.resunet import ResUNet3D  # noqa: F401
from vangan_tpu.models.vnet import VNet3D  # noqa: F401
from vangan_tpu.models.factory import build_discriminator, build_generator  # noqa: F401
