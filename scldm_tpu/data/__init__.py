from scldm_tpu.data.encoder import VocabularyEncoder  # noqa: F401
from scldm_tpu.data.h5ad import H5ADFile, write_h5ad  # noqa: F401
from scldm_tpu.data.tokenize import tokenize_cells  # noqa: F401
from scldm_tpu.data.datamodule import DataModule  # noqa: F401
