from dasr_tpu.losses.gan import (  # noqa: F401
    gan_loss,
    dsn_generator_adv_loss,
    dsn_discriminator_loss,
    ragan_pair_loss,
)
from dasr_tpu.losses.lpips import LPIPS, load_lpips_params  # noqa: F401
