from moshi_tpu.io.safetensors import SafeTensors, save_safetensors  # noqa: F401
from moshi_tpu.io.wav import load_wav, save_wav  # noqa: F401
from moshi_tpu.io.mimi_file import read_mimi_file, write_mimi_file  # noqa: F401
