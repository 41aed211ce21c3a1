from agacs_tpu.data.io import read_scp, read_wav, write_wav  # noqa: F401
from agacs_tpu.data.dataset import ASRDataset  # noqa: F401
from agacs_tpu.data.sampler import num_elements_batches  # noqa: F401
from agacs_tpu.data.collate import collate_batch  # noqa: F401
