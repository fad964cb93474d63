"""Model zoo: the two generator families and the discriminator.

All models are pure functions over flat parameter dicts whose keys mirror the
PyTorch reference's ``state_dict()`` names (values in our NHWC/HWIO layouts).
That makes `.pth` weight import a 1:1 key mapping (see ``weights.torch_import``)
and keeps everything a plain pytree for jit/grad/sharding.
"""

from .plain_generator import plain_generator_apply, plain_generator_init
from .enhanced_generator import enhanced_generator_apply, enhanced_generator_init
from .discriminator import discriminator_apply, discriminator_init

__all__ = [
    "plain_generator_apply", "plain_generator_init",
    "enhanced_generator_apply", "enhanced_generator_init",
    "discriminator_apply", "discriminator_init",
]
