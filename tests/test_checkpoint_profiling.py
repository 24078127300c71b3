"""Checkpoint/restore + profiling utility tests."""
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from jammy_flows_tpu import pdf
from jammy_flows_tpu.utils import checkpoint, profiling


def test_checkpoint_roundtrip():
    p = pdf("e2+s1", "gg+m", conditional_input_dim=2)
    params = p.init_params(seed=4)
    d = tempfile.mkdtemp() + "/ckpt"
    checkpoint.save(d, params, extra_state={"step": jnp.asarray(7)})
    like = pdf("e2+s1", "gg+m", conditional_input_dim=2).init_params(seed=99)
    restored, extra = checkpoint.restore(
        d, like_params=like, like_extra_state={"step": jnp.asarray(0)})
    for k in params:
        np.testing.assert_array_equal(np.asarray(params[k]),
                                      np.asarray(restored[k]))
    assert int(extra["step"]) == 7
    # restored params produce identical log-probs
    ci = jnp.ones((10, 2))
    x, _, _, _ = p.sample(params, jax.random.PRNGKey(0), conditional_input=ci)
    lp1, _, _ = p.log_prob(params, x, conditional_input=ci)
    lp2, _, _ = p.log_prob(restored, x, conditional_input=ci)
    np.testing.assert_array_equal(np.asarray(lp1), np.asarray(lp2))


def test_throughput_timer():
    p = pdf("e2", "g")
    params = p.init_params(seed=0)
    fn = jax.jit(lambda k: p.sample(params, k, samplesize=500)[0])
    stats = profiling.throughput(fn, jax.random.PRNGKey(0),
                                 items_per_call=500, reps=3)
    assert stats["items_per_s"] > 0
