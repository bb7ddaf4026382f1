"""Canonical batch / loss key names.

Parity with reference src/scldm/constants.py:22-38 (ModelEnum / LossEnum) so that
config files and batch dicts use identical keys.
"""

from enum import Enum


class DatasetEnum(str, Enum):
    """Census obs-column keys (reference constants.py:4-19)."""

    TISSUE = "tissue"
    TISSUE_GENERAL = "tissue_general"
    DONOR_ID = "donor_id"
    ASSAY = "assay"
    SUSPENSION_TYPE = "suspension_type"
    DATASET_ID = "dataset_id"
    NNZ = "nnz"
    RAW_SUM = "raw_sum"
    N_MEASURED_VARS = "n_measured_vars"
    SEX = "sex"
    DISEASE = "disease"
    DEVELOPMENT_STAGE = "development_stage"
    CELL_TYPE = "cell_type"


class ModelEnum(str, Enum):
    """Keys of model-facing batch entries."""

    COUNTS = "counts"
    GENES = "genes"
    LIBRARY_SIZE = "library_size"
    GENES_SUBSET = "genes_subset"
    COUNTS_SUBSET = "counts_subset"


class LossEnum(str, Enum):
    """Keys of loss terms."""

    LLH_LOSS = "llh"
    KL_LOSS = "kl"
    DIFF_LOSS = "diff"
    CR_LOSS = "cr"


#: Batch keys that are *not* condition labels (everything else in a batch dict is
#: treated as a class-conditioning column; reference models.py:639,681-688).
NON_CONDITION_KEYS = (
    ModelEnum.COUNTS.value,
    ModelEnum.GENES.value,
    ModelEnum.LIBRARY_SIZE.value,
    ModelEnum.GENES_SUBSET.value,
    ModelEnum.COUNTS_SUBSET.value,
)
