from aurora_tpu.utils.constants import (  # noqa: F401
    DEFAULT_IMAGE_TOKEN,
    DEFAULT_PAD_TOKEN_INDEX,
    IGNORE_INDEX,
    IMAGE_TOKEN_INDEX,
    VISUAL_PLACEHOLDER_ID,
)
from aurora_tpu.utils.templates import PROMPT_TEMPLATE  # noqa: F401
