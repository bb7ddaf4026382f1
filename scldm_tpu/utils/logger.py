"""Console logger (reference src/scldm/logger.py:6-23, minus the rich dep)."""

import logging
import sys

logger = logging.getLogger("scldm_tpu")
if not logger.handlers:
    _h = logging.StreamHandler(sys.stderr)
    _h.setFormatter(
        logging.Formatter("%(asctime)s %(levelname)s scldm_tpu: %(message)s", "%H:%M:%S")
    )
    logger.addHandler(_h)
    logger.setLevel(logging.INFO)
    logger.propagate = False
