"""Package smoke tests (reference tests/test_basic.py parity)."""


def test_version():
    import scldm_tpu

    assert scldm_tpu.__version__


def test_model_imports():
    from scldm_tpu.nn import DiT, ScviVAE, TransformerVAE  # noqa: F401
    from scldm_tpu.transport import Sampler, Transport, create_transport  # noqa: F401
    from scldm_tpu.data import DataModule, VocabularyEncoder  # noqa: F401
