"""Multi-device scaling benchmark (data-parallel NLL training, flagship).

Two modes:

* real devices (default): classic weak-scaling efficiency
  throughput_N(batch=b*N) / (N * throughput_1(batch=b)) -- run with
  jax.distributed.initialize() on each host of a pod slice.
* --virtual N (CPU mesh via xla_force_host_platform_device_count): all
  virtual devices share the host's physical cores and XLA:CPU gives even a
  1-device program the whole threadpool, so the classic formula is
  structurally ~1/N there.  Instead this mode measures the SHARDING
  OVERHEAD -- same total batch, unsharded vs pjit-sharded over N devices
  (partitioned program + gradient psum); 1.0 means zero overhead.
  Measured 2026-08-18 (8 virtual devices, 4 cores): ratio 1.11.
"""
import argparse
import json
import os
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--virtual", type=int, default=0,
                    help="fake this many CPU devices PER PROCESS "
                         "(0 = use real devices)")
    ap.add_argument("--batch-per-device", type=int, default=16384)
    ap.add_argument("--tiny", action="store_true",
                    help="tiny e2/gg config (CI multi-process smoke)")
    ap.add_argument("--coordinator", default=None,
                    help="host:port of the jax.distributed coordinator "
                         "(multi-process mode; launch one process per host)")
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--process-id", type=int, default=None)
    args = ap.parse_args()

    if args.virtual:
        os.environ["JAX_PLATFORMS"] = "cpu"
        flags = os.environ.get("XLA_FLAGS", "")
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={args.virtual}")

    import jax

    if args.virtual:
        # the environment's sitecustomize force-selects the axon TPU
        # platform regardless of the env var; the config update wins as
        # long as backends are not yet initialized (same as tests/conftest)
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax
    from jammy_flows_tpu import pdf
    from jammy_flows_tpu.parallel import mesh as mesh_mod

    if args.coordinator is not None:
        ok = mesh_mod.initialize_distributed(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes, process_id=args.process_id,
            strict=True)
        assert ok, "multi-process initialization failed"

    devices = jax.devices()
    n_dev = len(devices)
    print(f"devices: {n_dev} x {devices[0].platform} "
          f"({jax.process_count()} process(es))")

    if args.tiny:
        p = pdf("e2", "gg", conditional_input_dim=3)
    else:
        p = pdf("e4+s2+e4", "gggg+f+gggg", conditional_input_dim=3)
    params = p.init_params(seed=0, dtype=jnp.float32)
    opt = optax.adam(1e-3)

    def measure(n_devices, batch):
        m = mesh_mod.make_mesh(n_devices)
        # multi-process: build only this process's LOCAL rows; shard_batch
        # assembles the global array via make_array_from_process_local_data
        # (device_put cannot target non-addressable devices on a pod).
        rows = batch // jax.process_count()
        x = jnp.zeros((rows, p.total_target_dim), jnp.float32)
        for k, d in enumerate(p.pdf_defs_list):
            if d == "s2":
                lo, hi = p.target_dim_indices[k]
                x = x.at[:, lo].set(1.0).at[:, lo + 1].set(1.0)
        ci = jnp.ones((rows, 3), jnp.float32)
        params_r = mesh_mod.replicate(m, params)
        opt_state = mesh_mod.replicate(m, opt.init(params))
        x = mesh_mod.shard_batch(m, x)
        ci = mesh_mod.shard_batch(m, ci)

        @jax.jit
        def train_step(params, opt_state, x, ci):
            loss, g = jax.value_and_grad(
                lambda pp: -p.log_prob(pp, x, conditional_input=ci)[0].mean())(params)
            updates, opt_state = opt.update(g, opt_state)
            return optax.apply_updates(params, updates), opt_state, loss

        # warmup/compile
        params2, opt2, loss = train_step(params_r, opt_state, x, ci)
        float(loss)
        t0 = time.time()
        reps = 5
        for _ in range(reps):
            params2, opt2, loss = train_step(params2, opt2, x, ci)
            float(loss)  # genuine sync
        # the loss does not depend on the last rep's param/opt update; sync
        # those too before stopping the clock (CPU path, so the axon-tunnel
        # block_until_ready caveat does not apply)
        jax.block_until_ready((params2, opt2))
        dt = (time.time() - t0) / reps
        return batch / dt

    if not args.virtual or jax.process_count() > 1:
        # Real chips (or a multi-process virtual cluster): classic
        # weak-scaling efficiency
        # throughput_N(batch=b*N) / (N * throughput_1(batch=b)).
        # Multi-host: every mesh size must be addressable by every process
        # (make_mesh takes k local devices per process), so sizes are
        # multiples of process_count and the baseline is one device/host.
        pc = jax.process_count()
        sizes = sorted({pc, max(pc, (n_dev // pc // 2) * pc), n_dev})
        results = {}
        base = None
        for n in sizes:
            thr = measure(n, args.batch_per_device * n)
            results[n] = thr
            base = base if base is not None else thr / sizes[0]
            eff = thr / (n * base)
            print(f"{n} device(s): {thr:,.0f} items/s  efficiency {eff:.3f}")
        print(json.dumps({
            "metric": "data-parallel NLL-training scaling efficiency",
            "value": round(results[n_dev] / (n_dev * base), 3),
            "unit": "efficiency",
            "throughputs": {str(k): round(v, 1) for k, v in results.items()},
        }))
        return
    sizes = sorted({1, max(1, n_dev // 2), n_dev})

    # Virtual CPU mesh: all "devices" share the host's physical cores AND
    # the XLA:CPU client gives a 1-device computation the whole threadpool,
    # so the classic efficiency formula is structurally ~1/N here no matter
    # how good the sharding is.  The honest CPU-measurable quantity is the
    # SHARDING OVERHEAD: the same total batch, unsharded on 1 device vs
    # sharded over N devices (pjit partitioning + gradient psum).  A ratio
    # near 1.0 means the partitioned program adds no overhead; on real
    # chips (tiny replicated params, batch-only sharding) efficiency is
    # then ICI-collective-bound, not partition-bound.
    batch = args.batch_per_device * n_dev
    base = measure(1, batch)
    print(f"1 device, batch {batch}: {base:,.0f} items/s (unsharded baseline)")
    results = {1: base}
    for n in sizes[1:]:
        thr = measure(n, batch)
        results[n] = thr
        print(f"{n} device(s), same batch: {thr:,.0f} items/s  "
              f"sharded/unsharded {thr / base:.3f}")
    print(json.dumps({
        "metric": f"sharding-overhead ratio (sharded@{n_dev}dev/unsharded, "
                  "same batch, virtual CPU mesh)",
        "value": round(results[n_dev] / base, 3),
        "unit": "ratio (1.0 = zero partitioning overhead)",
        "throughputs": {str(k): round(v, 1) for k, v in results.items()},
    }))


if __name__ == "__main__":
    main()
