"""WandbLogger liveness with an injected fake wandb module.

wandb is not installed in this image; the logger's contract (init with
group/resume, metric log, config update, grid-image push — reference
configs/logger/wandb.yaml, utils_eval.py:627, utils.py:200-202) is exercised
against a minimal in-memory fake injected through the module's `_wandb`
hook, including run-id persistence/resume across logger instances.
"""
import json
import os

import numpy as np

import conditioned_diffusion_models_uad_tpu.log.loggers as L
from conditioned_diffusion_models_uad_tpu.log.loggers import MultiLogger, WandbLogger


class _FakeRun:
    def __init__(self, run_id):
        self.id = run_id
        self.logged = []
        self.config_updates = []
        self.finished = False
        self.config = self

    def log(self, payload, step=None):
        self.logged.append((payload, step))

    def update(self, d, allow_val_change=False):
        self.config_updates.append(dict(d))

    def finish(self):
        self.finished = True


class _FakeImage:
    def __init__(self, path):
        self.path = path


class _FakeWandb:
    def __init__(self):
        self.inits = []
        self.Image = _FakeImage

    def init(self, project=None, group=None, id=None, resume=None, dir=None):
        self.inits.append(dict(project=project, group=group, id=id,
                               resume=resume, dir=dir))
        return _FakeRun(id or "generated-run-id")


def test_wandb_logger_end_to_end(tmp_path, monkeypatch):
    fake = _FakeWandb()
    monkeypatch.setattr(L, "_wandb", fake)

    lg = WandbLogger(str(tmp_path), project="uad_IXI", group="exp1")
    assert fake.inits[0]["project"] == "uad_IXI"
    assert fake.inits[0]["group"] == "exp1"
    assert fake.inits[0]["resume"] == "allow"

    lg.log_metrics({"val/loss_comb": 0.5}, step=10)
    lg.log_hyperparams({"lr": 1e-4})
    img = tmp_path / "grid.png"
    img.write_bytes(b"png")
    lg.log_image("Brats21/test/grid", str(img))
    lg.finish()

    run = lg.run
    assert run.logged[0] == ({"val/loss_comb": 0.5}, 10)
    key, imgs = next(iter(run.logged[1][0].items())), None
    assert key[0] == "Brats21/test/grid"
    assert isinstance(key[1][0], _FakeImage) and key[1][0].path == str(img)
    assert run.config_updates == [{"lr": 1e-4}]
    assert run.finished

    # run id persisted and resumed by the next logger instance (ref
    # utils.get_checkpoint wandb-ID recovery, utils.py:200-202)
    with open(os.path.join(str(tmp_path), "wandb_id.json")) as f:
        saved = json.load(f)["id"]
    lg2 = WandbLogger(str(tmp_path), project="uad_IXI", group="exp1")
    assert fake.inits[1]["id"] == saved


def test_eval_session_pushes_grids(tmp_path, monkeypatch):
    """save_output_images + a logger: every saved grid is pushed."""
    fake = _FakeWandb()
    monkeypatch.setattr(L, "_wandb", fake)
    from conditioned_diffusion_models_uad_tpu.eval.harness import (
        EvalConfig, EvalSession,
    )

    lg = MultiLogger(WandbLogger(str(tmp_path), project="p"))
    cfg = EvalConfig(erode_brainmask=False, save_output_images=True,
                     out_dir=str(tmp_path))
    sess = EvalSession(cfg, "Brats21", "val", logger=lg)
    rng = np.random.default_rng(0)
    vol = rng.random((16, 16, 12), np.float32)
    seg = np.zeros_like(vol)
    seg[4:8, 4:8, 2:5] = 1
    sess.test_step(vol * 0.9, vol, seg, np.ones_like(vol), batch_idx=0, ID="v0", label_vol=1)

    run = lg.loggers[0].run
    pushed = [p for p, _ in run.logged if "Brats21/val/grid" in p]
    assert len(pushed) == 2  # slices 0 and 10
    assert os.path.exists(os.path.join(str(tmp_path), "grid", "v0_0_Grid.png"))
