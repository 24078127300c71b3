"""Trainer (train.fit) + CLI end-to-end tests."""
import json
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np

from jammy_flows_tpu import pdf, train


def _two_moons(n=1500, seed=0):
    rng = np.random.default_rng(seed)
    t = rng.uniform(0, np.pi, n)
    x1 = np.stack([np.cos(t), np.sin(t)], 1) + rng.normal(0, 0.1, (n, 2))
    x2 = np.stack([1 - np.cos(t), 0.5 - np.sin(t)], 1) + \
        rng.normal(0, 0.1, (n, 2))
    return np.concatenate([x1, x2])


def test_fit_converges_with_schedule_and_checkpoints(tmp_path):
    data = _two_moons()
    p = pdf("e2", "gg")
    params = p.init_params(seed=0, data=data)
    params, hist = train.fit(
        p, params, data, num_steps=220, learning_rate=1e-2,
        schedule="cosine", clip_norm=10.0, batch_size=512,
        checkpoint_path=str(tmp_path), checkpoint_every=100)
    assert hist.shape == (220,)
    assert hist[-20:].mean() < hist[:20].mean() - 0.3
    # checkpoints written at 100/200/220
    names = sorted(q.name for q in tmp_path.iterdir())
    assert names == ["step_00000100", "step_00000200", "step_00000220"]
    # restored checkpoint evaluates
    from jammy_flows_tpu.utils import checkpoint as ckpt
    p2, _ = ckpt.restore(str(tmp_path / "step_00000220"),
                         like_params=jax.tree.map(jnp.zeros_like, params))
    lp, _, _ = p.log_prob(p2, jnp.asarray(data[:64]))
    assert np.isfinite(np.asarray(lp)).all()


def test_fit_conditional_minibatch():
    rng = np.random.default_rng(1)
    ci = rng.normal(0, 1, (2000, 1))
    x = 1.5 * ci + rng.normal(0, 0.5, (2000, 1))
    p = pdf("e1", "t", conditional_input_dim=1,
            options_overwrite={"t": {"cov_type": "diagonal"}})
    params = p.init_params(seed=0)
    params, hist = train.fit(p, params, x, conditional_input=ci,
                             num_steps=300, batch_size=256,
                             learning_rate=3e-2)
    s, _, _, _ = p.sample(params, jax.random.PRNGKey(0),
                          conditional_input=jnp.full((4000, 1), 1.0))
    s = np.asarray(s)
    assert abs(s.mean() - 1.5) < 0.15
    assert abs(s.std() - 0.5) < 0.12


def test_cli_fit_sample_eval_moments(tmp_path):
    data = _two_moons(800)
    np.save(tmp_path / "data.npy", data)
    model_dir = tmp_path / "model"

    def run(*args):
        r = subprocess.run([sys.executable, "-m", "jammy_flows_tpu",
                            *map(str, args), "--platform", "cpu"],
                           capture_output=True, text=True, timeout=600)
        assert r.returncode == 0, r.stderr[-2000:]
        return r.stdout

    run("fit", "--pdf-defs", "e2", "--flow-defs", "gg",
        "--data", tmp_path / "data.npy", "--out", model_dir,
        "--steps", "150", "--lr", "1e-2")
    assert (model_dir / "model.json").exists()

    run("sample", "--model", model_dir, "-n", "2000",
        "--out", tmp_path / "samples.npy")
    s = np.load(tmp_path / "samples.npy")
    assert s.shape == (2000, 2)
    assert abs(s[:, 0].mean() - 0.5) < 0.3

    out = run("eval", "--model", model_dir, "--data", tmp_path / "data.npy")
    stats = json.loads(out.strip().splitlines()[-1])
    assert stats["mean_nll"] < 2.2
    assert stats["finite_fraction"] == 1.0

    out = run("moments", "--model", model_dir, "-n", "500")
    mm = json.loads(out[out.index("{"):])
    assert "mean_0" in mm and "varlike_0" in mm
