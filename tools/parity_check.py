"""NLL + moment parity: train reference (torch) and jammy_flows_tpu on the
same datasets, compare converged NLL and posterior moments."""
import sys, time
import numpy as np

rng = np.random.default_rng(0)
n = 2000
t = rng.uniform(0, np.pi, n)
x1 = np.stack([np.cos(t), np.sin(t)], 1) + rng.normal(0, 0.1, (n, 2))
x2 = np.stack([1 - np.cos(t), 0.5 - np.sin(t)], 1) + rng.normal(0, 0.1, (n, 2))
data = np.concatenate([x1, x2]).astype(np.float64)

# ---- reference (torch) ----
sys.path.insert(0, "/root/reference")
import torch
import jammy_flows
torch.manual_seed(0)
torch.set_num_threads(8)
p_ref = jammy_flows.pdf("e2", "gg")
p_ref.double()
p_ref.init_params(data=torch.from_numpy(data))
opt = torch.optim.Adam(p_ref.parameters(), lr=1e-2)
xt = torch.from_numpy(data)
t0 = time.time()
for i in range(250):
    opt.zero_grad()
    logp, _, _ = p_ref(xt)
    loss = -logp.mean()
    loss.backward()
    opt.step()
ref_nll = float(loss)
print(f"reference: final NLL {ref_nll:.4f}  ({time.time()-t0:.1f}s)")
with torch.no_grad():
    s_ref, _, _, _ = p_ref.sample(samplesize=20000)
s_ref = s_ref.numpy()
print("reference moments: mean", s_ref.mean(0).round(4), "cov", np.cov(s_ref.T).round(4).tolist())

# ---- ours (jax, f64 CPU for apples-to-apples) ----
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import optax
from jammy_flows_tpu import pdf as jpdf
p = jpdf("e2", "gg")
params = p.init_params(seed=0, data=data)
opt2 = optax.adam(1e-2)
st = opt2.init(params)
dj = jnp.asarray(data)
@jax.jit
def step(params, st):
    l, g = jax.value_and_grad(lambda pp: -p.log_prob(pp, dj)[0].mean())(params)
    u, st = opt2.update(g, st)
    return optax.apply_updates(params, u), st, l
t0 = time.time()
for i in range(250):
    params, st, l = step(params, st)
our_nll = float(l)
print(f"ours:      final NLL {our_nll:.4f}  ({time.time()-t0:.1f}s)")
s, _, _, _ = p.sample(params, jax.random.PRNGKey(1), samplesize=20000)
s = np.asarray(s)
print("our moments:       mean", s.mean(0).round(4), "cov", np.cov(s.T).round(4).tolist())
print(f"\nNLL diff: {abs(ref_nll-our_nll):.4f}")
print("mean diff:", np.abs(s_ref.mean(0)-s.mean(0)).round(4))
print("cov diff:", np.abs(np.cov(s_ref.T)-np.cov(s.T)).max().round(4))
