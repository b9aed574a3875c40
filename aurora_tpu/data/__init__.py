from aurora_tpu.data.preprocess import (CLIP_MEAN, CLIP_STD, clip_preprocess,
                                        expand2square,
                                        keep_aspect_preprocess)
from aurora_tpu.data.video import read_video, sample_frame_indices

__all__ = ["CLIP_MEAN", "CLIP_STD", "clip_preprocess", "expand2square",
           "keep_aspect_preprocess", "read_video", "sample_frame_indices"]
