"""Framework-wide constants.

Values mirror the reference contract (src/xtuner/xtuner/utils/constants.py:1-5)
so datasets tokenized for the reference work unchanged here.
"""

IGNORE_INDEX = -100
DEFAULT_PAD_TOKEN_INDEX = 0
IMAGE_TOKEN_INDEX = -200
DEFAULT_IMAGE_TOKEN = "<image>"

# TPU-specific: positions reserved for visual embeddings in the fused sequence
# carry this benign vocabulary id on-device (the embedding lookup result is
# overwritten by the visual splice), so input_ids stay within vocab range and
# gathers remain valid under jit.
VISUAL_PLACEHOLDER_ID = 0
