"""Built-in task definitions. Importing this package registers them."""

from aurora_tpu.eval.tasks import captions, mmbench, vdc  # noqa: F401
