"""WandbLogger against a stub wandb backend: the rank-0 gate, the log/finish
call contract (reference training/default.yaml:19-36 runs a rank-0
WandbLogger), and clean degradation when the package is absent or init
raises — previously only the degradation path was ever exercised."""

import sys
import types

import pytest

from scldm_tpu.utils.wandb_logger import WandbLogger


class StubRun:
    def __init__(self):
        self.rows = []
        self.finished = False

    def log(self, metrics, step=None):
        self.rows.append((dict(metrics), step))

    def finish(self):
        self.finished = True


@pytest.fixture
def stub_wandb(monkeypatch):
    mod = types.ModuleType("wandb")
    mod.calls = []

    def init(project=None, name=None, config=None):
        mod.calls.append({"project": project, "name": name, "config": config})
        mod.run = StubRun()
        return mod.run

    mod.init = init
    monkeypatch.setitem(sys.modules, "wandb", mod)
    return mod


def test_logs_through_backend(stub_wandb):
    lg = WandbLogger(project="p", name="n", config={"lr": 1e-3})
    assert stub_wandb.calls == [{"project": "p", "name": "n", "config": {"lr": 1e-3}}]
    lg.log({"train_loss": 1.5}, step=10)
    lg.log({"val_loss": 0.5})
    lg.finish()
    assert stub_wandb.run.rows == [({"train_loss": 1.5}, 10), ({"val_loss": 0.5}, None)]
    assert stub_wandb.run.finished


def test_disabled_never_touches_backend(stub_wandb):
    lg = WandbLogger(enabled=False)
    lg.log({"x": 1.0}, step=0)
    lg.finish()
    assert stub_wandb.calls == []


def test_rank_nonzero_does_not_init(stub_wandb, monkeypatch):
    import jax

    monkeypatch.setattr(jax, "process_index", lambda: 1)
    lg = WandbLogger()
    lg.log({"x": 1.0})
    lg.finish()
    assert stub_wandb.calls == []


def test_init_failure_degrades_to_noop(monkeypatch):
    mod = types.ModuleType("wandb")

    def init(**kw):
        raise RuntimeError("no network")

    mod.init = init
    monkeypatch.setitem(sys.modules, "wandb", mod)
    lg = WandbLogger()  # must not raise
    lg.log({"x": 1.0}, step=1)
    lg.finish()
