"""NLL + posterior-moment parity vs the PyTorch reference on ALL FIVE
BASELINE.json configs.

For each config, the torch reference (/root/reference, float64 CPU as its
docs require) and jammy_flows_tpu (float64 CPU for apples-to-apples) are
trained on the SAME dataset with the same optimizer settings, then compared
on converged NLL and on posterior moments of 20k samples.  Differences must
sit within Monte-Carlo/optimization noise (tolerances per config below).

Run: PYTHONPATH=/root/repo python tools/parity_check.py [config_index ...]
(no args = all; the flagship config 4 takes ~5-10 min.)
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/reference")
os.environ["JAX_PLATFORMS"] = "cpu"

import torch                                   # noqa: E402
import jammy_flows                             # noqa: E402  (the reference)

import jax                                     # noqa: E402
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp                        # noqa: E402
import optax                                   # noqa: E402
from jammy_flows_tpu import pdf as jpdf        # noqa: E402

torch.set_num_threads(8)
RESULTS = []


def train_ref(p_ref, data, iters, lr=1e-2, ci=None, extra_loss=None,
              clip=None):
    p_ref.double()
    opt = torch.optim.Adam(p_ref.parameters(), lr=lr)
    xt = torch.from_numpy(data)
    cit = None if ci is None else torch.from_numpy(ci)
    t0 = time.time()
    for _ in range(iters):
        opt.zero_grad()
        logp, _, _ = p_ref(xt) if cit is None else p_ref(xt, conditional_input=cit)
        loss = -logp.mean()
        if extra_loss is not None:
            loss = loss + extra_loss(p_ref)
        loss.backward()
        if clip is not None:
            torch.nn.utils.clip_grad_norm_(p_ref.parameters(), clip)
        opt.step()
    return float(loss.detach()), time.time() - t0


def train_ours(p, params, data, iters, lr=1e-2, ci=None, extra_loss=None,
               clip=None):
    opt = optax.adam(lr) if clip is None else optax.chain(
        optax.clip_by_global_norm(clip), optax.adam(lr))
    st = opt.init(params)
    dj = jnp.asarray(data)
    cij = None if ci is None else jnp.asarray(ci)

    @jax.jit
    def step(params, st):
        def loss_fn(pp):
            logp, _, _ = p.log_prob(pp, dj, conditional_input=cij)
            loss = -logp.mean()
            if extra_loss is not None:
                loss = loss + extra_loss(p, pp)
            return loss
        l, g = jax.value_and_grad(loss_fn)(params)
        u, st = opt.update(g, st)
        return optax.apply_updates(params, u), st, l

    t0 = time.time()
    for _ in range(iters):
        params, st, l = step(params, st)
    return params, float(l), time.time() - t0


def sample_ref(p_ref, n=20000, ci=None):
    with torch.no_grad():
        if ci is None:
            s, _, _, _ = p_ref.sample(samplesize=n)
        else:
            s, _, _, _ = p_ref.sample(conditional_input=torch.from_numpy(ci))
    return s.numpy()


def copy_ref_params(p_ref, params):
    """Overwrite our trainable pytree with the torch reference's init values.

    Valid because the flat packing conventions mirror the reference exactly
    (verified pointwise to ~2e-9 on e4/gggg): ``flow_0`` equals the
    concatenation of sub-manifold-0 layer parameters in registration order,
    and each ``mlp_k`` equals [W1, b1, W2, b2, ...] of the reference's
    nn.Sequential predictor (main/default.py:656-670).  Starting both
    frameworks from the SAME point makes the converged-NLL comparison test
    optimization dynamics + math parity rather than init-seed luck.
    """
    params = dict(params)
    if "flow_0" in params:
        vec = np.concatenate([q.detach().numpy().ravel()
                              for q in p_ref.layer_list[0].parameters()])
        assert vec.size == np.asarray(params["flow_0"]).size, \
            (vec.size, np.asarray(params["flow_0"]).size)
        params["flow_0"] = jnp.asarray(vec)
    for k, mlp in enumerate(p_ref.mlp_predictors):
        key = f"mlp_{k}"
        if mlp is None or key not in params:
            continue
        vec = np.concatenate([q.detach().numpy().ravel()
                              for q in mlp.parameters()])
        assert vec.size == np.asarray(params[key]).size, \
            (key, vec.size, np.asarray(params[key]).size)
        params[key] = jnp.asarray(vec)
    return params


def sample_ours(p, params, n=20000, ci=None):
    cij = None if ci is None else jnp.asarray(ci)
    s, _, _, _ = p.sample(params, jax.random.PRNGKey(1), samplesize=n,
                          conditional_input=cij)
    return np.asarray(s)


def record(name, nll_ref, nll_our, s_ref, s_our, nll_tol, mom_tol,
           extra="", winsorize=None):
    """Compare converged NLL + moments of 20k posterior samples.

    winsorize=q: clip both sample sets to the POOLED per-dimension
    [q, 1-q] quantile range before computing moments.  Used for the
    flagship config, whose trained flows have genuine heavy tails (a few
    samples per 20k at |x|>100; roundtrip-verified exact, max |dlogp|
    1.2e-5 on those outliers, 2026-08-19): the raw 20k-sample covariance
    of a heavy-tailed distribution has unbounded MC error, so the robust
    (winsorized) moments are the statistically meaningful comparison.
    """
    if winsorize:
        pooled = np.concatenate([s_ref, s_our])
        lo = np.quantile(pooled, winsorize, axis=0)
        hi = np.quantile(pooled, 1 - winsorize, axis=0)
        s_ref = np.clip(s_ref, lo, hi)
        s_our = np.clip(s_our, lo, hi)
        extra = (extra + " " if extra else "") + f"winsorized q={winsorize}"
    if os.environ.get("PARITY_DEBUG"):
        np.save(f"/tmp/parity_{name.split()[0].replace('/','_')}_ref.npy", s_ref)
        np.save(f"/tmp/parity_{name.split()[0].replace('/','_')}_our.npy", s_our)
        print("  ref cov diag", np.diag(np.cov(s_ref.T)).round(3))
        print("  our cov diag", np.diag(np.cov(s_our.T)).round(3))
        print("  ref |max|", np.abs(s_ref).max(0).round(2))
        print("  our |max|", np.abs(s_our).max(0).round(2))
    mean_d = np.abs(s_ref.mean(0) - s_our.mean(0)).max()
    cov_d = np.abs(np.cov(s_ref.T) - np.cov(s_our.T)).max()
    ok = abs(nll_ref - nll_our) < nll_tol and mean_d < mom_tol \
        and cov_d < 3 * mom_tol
    RESULTS.append((name, nll_ref, nll_our, mean_d, cov_d, ok))
    print(f"  NLL ref {nll_ref:.4f} ours {nll_our:.4f} "
          f"(diff {abs(nll_ref-nll_our):.4f}, tol {nll_tol}); "
          f"mean diff {mean_d:.4f}, cov diff {cov_d:.4f} (tol {mom_tol})"
          f"{'  ' + extra if extra else ''}  -> "
          f"{'PASS' if ok else 'FAIL'}")
    return ok


# --------------------------------------------------------------------------
def config1():
    """pdf("e2","gg") two-moons density fit."""
    print('[1] pdf("e2","gg") two-moons')
    rng = np.random.default_rng(0)
    n = 2000
    t = rng.uniform(0, np.pi, n)
    x1 = np.stack([np.cos(t), np.sin(t)], 1) + rng.normal(0, 0.1, (n, 2))
    x2 = np.stack([1 - np.cos(t), 0.5 - np.sin(t)], 1) + rng.normal(0, 0.1, (n, 2))
    data = np.concatenate([x1, x2]).astype(np.float64)

    torch.manual_seed(0)
    p_ref = jammy_flows.pdf("e2", "gg")
    p_ref.init_params(data=torch.from_numpy(data))
    nll_ref, dt_r = train_ref(p_ref, data, 250)
    s_ref = sample_ref(p_ref)

    p = jpdf("e2", "gg")
    params = p.init_params(seed=0, data=data)
    params, nll_our, dt_o = train_ours(p, params, data, 250)
    s_our = sample_ours(p, params)
    print(f"  (ref {dt_r:.1f}s, ours {dt_o:.1f}s)")
    return record("e2/gg two-moons", nll_ref, nll_our, s_ref, s_our,
                  nll_tol=0.03, mom_tol=0.03)


def config2():
    """pdf("e4","t") with conditional amortized parameters."""
    print('[2] pdf("e4","t") conditional MVN')
    rng = np.random.default_rng(1)
    n = 4000
    ci = rng.normal(0, 1, (n, 2))
    A = np.array([[1.0, 0.3], [-0.5, 0.8], [0.2, -1.0], [0.7, 0.1]])
    x = ci @ A.T + rng.normal(0, 0.5, (n, 4))
    x = x.astype(np.float64)
    ci = ci.astype(np.float64)

    torch.manual_seed(0)
    p_ref = jammy_flows.pdf("e4", "t", conditional_input_dim=2)
    p_ref.double()
    p_ref.init_params()
    nll_ref, dt_r = train_ref(p_ref, x, 300, ci=ci)

    p = jpdf("e4", "t", conditional_input_dim=2)
    params = p.init_params(seed=0)
    params, nll_our, dt_o = train_ours(p, params, x, 300, ci=ci)

    ci_fix = np.tile(np.array([[1.0, -0.5]]), (20000, 1))
    s_ref = sample_ref(p_ref, ci=ci_fix)
    s_our = sample_ours(p, params, ci=ci_fix)
    print(f"  (ref {dt_r:.1f}s, ours {dt_o:.1f}s)")
    return record("e4/t conditional", nll_ref, nll_our, s_ref, s_our,
                  nll_tol=0.05, mom_tol=0.06)


def config3():
    """s1 circle: Moebius + circular RQ-spline, differentiable inverse."""
    print('[3] pdf("s1","mo") circle flows')
    rng = np.random.default_rng(2)
    n = 3000
    comp = rng.random(n) < 0.6
    ang = np.where(comp, rng.normal(1.0, 0.3, n), rng.normal(4.0, 0.4, n))
    data = np.mod(ang, 2 * np.pi).astype(np.float64)[:, None]

    torch.manual_seed(0)
    p_ref = jammy_flows.pdf("s1", "mo")
    p_ref.double()
    p_ref.init_params()
    nll_ref, dt_r = train_ref(p_ref, data, 300)
    s_ref = sample_ref(p_ref)

    p = jpdf("s1", "mo")
    params = p.init_params(seed=0)
    params, nll_our, dt_o = train_ours(p, params, data, 300)
    s_our = sample_ours(p, params)

    # circular moments: resultant vector (cos, sin) mean
    def circ(s):
        return np.stack([np.cos(s[:, 0]), np.sin(s[:, 0])], 1)
    print(f"  (ref {dt_r:.1f}s, ours {dt_o:.1f}s)")
    return record("s1/mo circle", nll_ref, nll_our, circ(s_ref), circ(s_our),
                  nll_tol=0.05, mom_tol=0.03)


def config4():
    """Flagship joint e4+s2+e4 with the 'f' sphere flow."""
    print('[4] pdf("e4+s2+e4","gggg+f+gggg") flagship joint')
    rng = np.random.default_rng(3)
    n = 2048
    e1 = rng.normal(0, 1, (n, 4)) * np.array([1.0, 0.5, 0.8, 1.2])
    # concentrated directions, mean tilting smoothly with e1[:,0] (keeps the
    # autoregressive conditioning active but the target unimodal, so both
    # frameworks converge within the run)
    mu = np.stack([0.3 * np.tanh(e1[:, 0]), np.zeros(n), np.ones(n)], 1)
    mu /= np.linalg.norm(mu, axis=1, keepdims=True)
    raw = mu + rng.normal(0, 0.35, (n, 3))
    raw /= np.linalg.norm(raw, axis=1, keepdims=True)
    theta = np.arccos(np.clip(raw[:, 2], -1, 1))
    phi = np.mod(np.arctan2(raw[:, 1], raw[:, 0]), 2 * np.pi)
    e2_ = 0.5 * e1 + rng.normal(0, 0.7, (n, 4))
    data = np.concatenate([e1, theta[:, None], phi[:, None], e2_], 1)
    data = data.astype(np.float64)

    iters = 1600
    torch.manual_seed(0)
    p_ref = jammy_flows.pdf("e4+s2+e4", "gggg+f+gggg")
    p_ref.double()
    p_ref.init_params()
    # snapshot the init point BEFORE training: ours starts from the exact
    # same parameters, so the converged-NLL check tests math + optimization
    # parity, not init-seed luck (both frameworks' random inits spread over
    # ~25 nats on this config)
    p = jpdf("e4+s2+e4", "gggg+f+gggg")
    params = copy_ref_params(p_ref, p.init_params(seed=0))
    # identical gradient clipping on BOTH sides: at lr=2e-3 the unclipped
    # torch reference intermittently NaNs mid-run on this config (observed
    # 2026-08-19: its e1 gggg block diverged at iter ~1k), so the parity
    # comparison uses the same clipped-Adam optimizer in both frameworks
    nll_ref, dt_r = train_ref(p_ref, data, iters, lr=2e-3, clip=10.0)
    s_ref = sample_ref(p_ref)

    params, nll_our, dt_o = train_ours(p, params, data, iters, lr=2e-3,
                                       clip=10.0)
    s_our = sample_ours(p, params)

    # unwinsorized TAIL gate: roundtrip |dlogp| on the trained flow's own
    # samples.  The winsorized moment comparison below deliberately clips
    # genuine heavy tails; this assertion keeps tail regressions visible:
    # a sampling-solver failure in the tails shows up as a large roundtrip
    # error long before it moves clipped moments.  Calibration (2026-08-20,
    # full config-4 run, reproduced with the column path both ON and OFF):
    # q50 9.1e-7, q999 1.3e-5, max 2.2e-5 — the error concentrates in the
    # trained flow's genuine heavy tails where the fixed-trip-count Newton
    # inverse sees near-flat CDF regions; the untrained flagship measures
    # q999 8.5e-13.  Gate set one order above the recorded values.
    sj, _, logq, _ = p.sample(params, jax.random.PRNGKey(1),
                              samplesize=20000)
    lp, _, _ = p.log_prob(params, sj)
    d = np.abs(np.asarray(lp) - np.asarray(logq))
    q999, dmax = float(np.quantile(d, .999)), float(d.max())
    print(f"  our roundtrip |dlogp| (unwinsorized tail gate): "
          f"q50 {np.quantile(d, .5):.2e} q999 {q999:.2e} max {dmax:.2e}")
    assert q999 < 1e-4 and dmax < 1e-3, \
        (f"flagship tail roundtrip regression: q999 {q999:.2e} "
         f"max {dmax:.2e}")
    if os.environ.get("PARITY_DEBUG"):
        ext = np.abs(np.asarray(sj)).max(axis=1) > 20
        print(f"  extreme samples (|x|>20): {ext.sum()}, their max dlogp: "
              f"{d[ext].max() if ext.any() else 0:.2e}")
        np.save("/tmp/parity_flagship_params.npy",
                np.concatenate([np.asarray(v).ravel()
                                for v in params.values()]))

    # moments on the embedded representation: e4 + s2 unit vector + e4
    def emb(s):
        th, ph = s[:, 4], s[:, 5]
        v = np.stack([np.sin(th) * np.cos(ph), np.sin(th) * np.sin(ph),
                      np.cos(th)], 1)
        return np.concatenate([s[:, :4], v, s[:, 6:]], 1)
    print(f"  (ref {dt_r:.1f}s, ours {dt_o:.1f}s)")
    return record("e4+s2+e4 flagship", nll_ref, nll_our, emb(s_ref),
                  emb(s_our), nll_tol=0.15, mom_tol=0.08, winsorize=0.001)


def config5():
    """Interval RQ-spline + simplex joint, then a standalone log-lambda
    Poisson head (the reference restricts the Poisson head to
    single-sub-pdf models, default.py:463-472)."""
    print('[5a] pdf("i1_0.0_1.0+a1","rr+w") joint')
    rng = np.random.default_rng(4)
    n = 3000
    xi = rng.beta(2.0, 3.0, (n, 1))
    xs = rng.dirichlet([2.0, 4.0], n)[:, :1]
    data = np.concatenate([xi, xs], 1).astype(np.float64)

    torch.manual_seed(0)
    p_ref = jammy_flows.pdf("i1_0.0_1.0+a1", "rr+w")
    p_ref.double()
    p_ref.init_params()
    nll_ref, dt_r = train_ref(p_ref, data, 300)
    s_ref = sample_ref(p_ref)

    p = jpdf("i1_0.0_1.0+a1", "rr+w")
    params = p.init_params(seed=0)
    params, nll_our, dt_o = train_ours(p, params, data, 300)
    s_our = sample_ours(p, params)
    print(f"  (ref {dt_r:.1f}s, ours {dt_o:.1f}s)")
    ok = record("i1+a1 joint", nll_ref, nll_our, s_ref, s_our,
                nll_tol=0.05, mom_tol=0.03)

    print('[5b] pdf("i1_0.0_1.0","rr") + Poisson log-normalization')
    k_obs = 3.0  # observed Poisson count; lambda must converge to 3 in both
    torch.manual_seed(0)
    p_ref2 = jammy_flows.pdf("i1_0.0_1.0", "rr",
                             predict_log_normalization=True)
    p_ref2.double()
    p_ref2.init_params()

    def extra_ref(pr):
        loglam = pr.log_mean_poisson()
        return (torch.exp(loglam) - k_obs * loglam).sum()

    nll_ref2, dt_r = train_ref(p_ref2, data[:, :1], 300,
                               extra_loss=extra_ref)
    s_ref2 = sample_ref(p_ref2)
    lam_ref = float(torch.exp(p_ref2.log_mean_poisson().detach()).squeeze())

    p2 = jpdf("i1_0.0_1.0", "rr", predict_log_normalization=True)
    params2 = p2.init_params(seed=0)

    def extra_ours(pp_obj, pp):
        loglam = pp_obj.log_mean_poisson(pp)
        return (jnp.exp(loglam) - k_obs * loglam).sum()

    params2, nll_our2, dt_o = train_ours(p2, params2, data[:, :1], 300,
                                         extra_loss=extra_ours)
    s_our2 = sample_ours(p2, params2)
    lam_our = float(jnp.exp(p2.log_mean_poisson(params2)).squeeze())
    print(f"  (ref {dt_r:.1f}s, ours {dt_o:.1f}s; "
          f"lambda ref {lam_ref:.3f} ours {lam_our:.3f}, target {k_obs})")
    ok2 = record("i1 + Poisson head", nll_ref2, nll_our2, s_ref2, s_our2,
                 nll_tol=0.05, mom_tol=0.03,
                 extra=f"lambda {lam_ref:.3f}/{lam_our:.3f}")
    return ok and ok2 and abs(lam_ref - k_obs) < 0.2 \
        and abs(lam_our - k_obs) < 0.2


CONFIGS = [config1, config2, config3, config4, config5]


def main():
    picks = [int(a) for a in sys.argv[1:]] or list(range(1, 6))
    all_ok = True
    for i in picks:
        try:
            all_ok &= bool(CONFIGS[i - 1]())
        except Exception as e:  # keep going, report at the end
            print(f"  ERROR in config {i}: {type(e).__name__}: {e}")
            all_ok = False
    print("\n== parity summary ==")
    for name, nr, no, md, cd, ok in RESULTS:
        print(f"  {'PASS' if ok else 'FAIL'}  {name}: NLL {nr:.4f}/{no:.4f} "
              f"mean_d {md:.4f} cov_d {cd:.4f}")
    sys.exit(0 if all_ok else 1)


if __name__ == "__main__":
    main()
