from dasr_tpu.data.io import (  # noqa: F401
    is_image_file,
    list_images,
    read_img,
    save_img,
)
from dasr_tpu.data.datasets import create_dataset  # noqa: F401
from dasr_tpu.data.pipeline import Loader  # noqa: F401
