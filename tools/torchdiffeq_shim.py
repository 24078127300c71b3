"""Minimal fixed-grid stand-in for torchdiffeq, used ONLY to drive the
torch reference's `c` CNF layer for fixture freezing (torchdiffeq is not
installed in this image; the reference prints a warning and disables `c`
without it, cnf_sphere_charts.py:5-8).

tools/make_parity_fixtures.py injects this module as ``sys.modules
["torchdiffeq"]`` before importing the reference, so the reference's own
chart bookkeeping, tangent-space RHS, divergence autograd, exp/log/jacoblog
maps and parameter packing all run UNMODIFIED — only the generic time
stepper is replaced.

The stepping schemes follow torchdiffeq's fixed-grid solvers:
  * ``rk4``   — the 3/8 rule (torchdiffeq's ``rk4_alt_step_func``), which
                is a DIFFERENT 4th-order scheme from the classic RK4 our
                JAX layer uses (jammy_flows_tpu/layers/sphere_cnf.py:199),
                so fixture agreement is evidence the two frameworks solve
                the same ODE, not that they share arithmetic;
  * ``midpoint``, ``euler`` — the standard schemes.

Forward evaluation only (sufficient for freezing fixtures); the adjoint
gradient path is not implemented.
"""
import torch


def _axpy(y, h, k):
    return tuple(yi + h * ki for yi, ki in zip(y, k))


def _lc(y, h, coeffs, ks):
    """y + h * sum_j coeffs[j] * ks[j], elementwise over the state tuple."""
    out = []
    for i, yi in enumerate(y):
        acc = yi
        for c, k in zip(coeffs, ks):
            acc = acc + (h * c) * k[i]
        out.append(acc)
    return tuple(out)


def _step_euler(func, t, h, y):
    return _axpy(y, h, func(t, y))


def _step_midpoint(func, t, h, y):
    k1 = func(t, y)
    k2 = func(t + 0.5 * h, _axpy(y, 0.5 * h, k1))
    return _axpy(y, h, k2)


def _step_rk4_38(func, t, h, y):
    """Kutta's 3/8 rule — torchdiffeq's rk4_alt_step_func scheme."""
    k1 = func(t, y)
    k2 = func(t + h / 3.0, _lc(y, h, [1.0 / 3.0], [k1]))
    k3 = func(t + 2.0 * h / 3.0, _lc(y, h, [-1.0 / 3.0, 1.0], [k1, k2]))
    k4 = func(t + h, _lc(y, h, [1.0, -1.0, 1.0], [k1, k2, k3]))
    return _lc(y, h, [1.0 / 8.0, 3.0 / 8.0, 3.0 / 8.0, 1.0 / 8.0],
               [k1, k2, k3, k4])


_STEPPERS = {"euler": _step_euler, "midpoint": _step_midpoint,
             "rk4": _step_rk4_38}


def odeint(func, y0, t, rtol=1e-7, atol=1e-9, method="rk4", options=None,
           adjoint_params=None, **kwargs):
    """Integrate tuple-state ``func(t, y) -> dy`` over the requested times.

    Returns a tuple of tensors with a leading time dimension of ``len(t)``
    (torchdiffeq's convention); ``t`` may be increasing or decreasing.
    """
    if method not in _STEPPERS:
        raise NotImplementedError(
            f"torchdiffeq shim supports only fixed-grid solvers "
            f"{sorted(_STEPPERS)}, not {method!r} - freeze fixtures with a "
            f"fixed-step config")
    step = _STEPPERS[method]
    step_size = float((options or {}).get("step_size", 1.0 / 32.0))
    was_tensor = torch.is_tensor(y0)
    y = (y0,) if was_tensor else tuple(y0)
    traj = [y]
    for i in range(len(t) - 1):
        t0 = float(t[i])
        t1 = float(t[i + 1])
        n = max(1, int(round(abs(t1 - t0) / step_size)))
        h = (t1 - t0) / n
        for j in range(n):
            y = step(func, t0 + j * h, h, y)
        traj.append(y)
    stacked = tuple(torch.stack([state[k] for state in traj], dim=0)
                    for k in range(len(y)))
    return stacked[0] if was_tensor else stacked


odeint_adjoint = odeint
