from agacs_tpu.decode.greedy import WHISPER_CS_PRIMER, greedy_decode  # noqa: F401
from agacs_tpu.decode.beam import beam_decode  # noqa: F401
