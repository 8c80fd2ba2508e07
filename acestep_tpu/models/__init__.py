from . import qwen  # noqa: F401
