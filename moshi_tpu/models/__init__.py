from moshi_tpu.models.mimi import MimiConfig, MimiModel  # noqa: F401
