"""Built-in task definitions. Importing this package registers them."""

from aurora_tpu.eval.tasks import (captions, mmbench, refcoco,  # noqa: F401
                                   vdc, video_mc, videochatgpt, videoqa,
                                   vqa)
