"""Micro-benchmark: continuous-RPE bias path variants on real TPU.

The bias path (reference dat_blocks.py:198-214, ours
models/deformable_attention.py MXU branch) is 43% of backbone forward
time per the round-1 ablation, running at ~2 TF/s — ~1% of v5e MXU peak.
Hypothesis: the (..., tw, h_g=2) layouts force 2-lane-minor transposes.

Variants (all numerically identical tap weights, f32 accumulation):
  v0  current pair of einsums ("bgynt,ghtu->bgynuh" then
      "bgynuh,bgwnu->bghywn")
  v1  h-major m1 ("bgynt,gthu->bgynhu" then "bgynhu,bgwnu->bghywn") —
      keeps u=tw minor everywhere, h_g never in the minor dim
  v2  n-batched explicit dot_general form of v1 (pre-transposed operands)
  v3  low-rank table (rank r SVD) — approximate, measures the FLOP floor
  ctl attention einsum pair (qk^T + av) at the same shapes, as a control

Usage: python tools/bench_bias.py [--stage 0 1 2 3] [--iters 30]
Run on TPU (default backend); add --cpu for a quick correctness pass.
"""

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np


# DAT-T++ @ 512x512: (g, heads, H, Ns, th) per stage; tw == th.
STAGES = {
    0: dict(g=1, heads=2, H=128, Ns=256, th=111),
    1: dict(g=2, heads=4, H=64, Ns=256, th=55),
    2: dict(g=4, heads=8, H=32, Ns=256, th=27),
    3: dict(g=8, heads=16, H=16, Ns=256, th=13),
}
# number of 'D' blocks per stage in DAT-T++ (depths 2,4,18,2, alternating
# X/D; last stage D,D)
D_BLOCKS = {0: 1, 1: 2, 2: 9, 3: 2}
B = 4


def _fetch(x):
    np.asarray(jax.device_get(x[(0,) * x.ndim]))


def lerp_weight_matrix(coords, size, dtype):
    i0 = jnp.floor(coords)
    t = (coords - i0)[..., None]
    i0 = i0.astype(jnp.int32)[..., None]
    taps = jax.lax.broadcasted_iota(
        jnp.int32, (1,) * coords.ndim + (size,), coords.ndim
    )
    w = jnp.where(taps == i0, 1.0 - t, 0.0) + jnp.where(taps == i0 + 1, t, 0.0)
    return w.astype(dtype)


def make_inputs(stage, dtype=jnp.bfloat16, seed=0):
    s = STAGES[stage]
    g, heads, H, Ns, th = s["g"], s["heads"], s["H"], s["Ns"], s["th"]
    W, tw = H, th
    rng = np.random.RandomState(seed)
    pos = jnp.asarray(
        rng.uniform(-1, 1, (B * g, Ns, 2)).astype(np.float32)
    )
    table = jnp.asarray(rng.randn(heads, th, tw).astype(np.float32) * 0.01)
    qy = jnp.arange(H, dtype=jnp.float32) / max(H - 1.0, 1.0) * 2.0 - 1.0
    qx = jnp.arange(W, dtype=jnp.float32) / max(W - 1.0, 1.0) * 2.0 - 1.0
    hc = 32
    q = jnp.asarray(rng.randn(B, H * W, heads, hc).astype(np.float32)).astype(dtype)
    k = jnp.asarray(rng.randn(B, Ns, heads, hc).astype(np.float32)).astype(dtype)
    v = jnp.asarray(rng.randn(B, Ns, heads, hc).astype(np.float32)).astype(dtype)
    rank = 8
    h_g = heads // g
    U = jnp.asarray(rng.randn(g, h_g, th, rank).astype(np.float32)).astype(dtype)
    V = jnp.asarray(rng.randn(g, h_g, tw, rank).astype(np.float32)).astype(dtype)
    return dict(pos=pos, table=table, qy=qy, qx=qx, q=q, k=k, v=v, U=U, V=V,
                meta=(g, heads, H, W, Ns, th, tw), dtype=dtype)


def tap_weights(inp):
    """(wy, wx) tap-weight tensors shared by all matmul variants."""
    g, heads, H, W, Ns, th, tw = inp["meta"]
    dt = inp["dtype"]
    pos, qy, qx = inp["pos"], inp["qy"], inp["qx"]
    dy = (qy[None, :, None] - pos[..., 0][:, None, :]) * 0.5  # (B*g, H, Ns)
    dx = (qx[None, :, None] - pos[..., 1][:, None, :]) * 0.5  # (B*g, W, Ns)
    fy = (dy + 1.0) * 0.5 * (th - 1)
    fx = (dx + 1.0) * 0.5 * (tw - 1)
    wy = lerp_weight_matrix(fy, th, dt).reshape(B, g, H, Ns, th)
    wx = lerp_weight_matrix(fx, tw, dt).reshape(B, g, W, Ns, tw)
    return wy, wx


def v0(inp):
    g, heads, H, W, Ns, th, tw = inp["meta"]
    h_g = heads // g
    dt = inp["dtype"]
    wy, wx = tap_weights(inp)
    tblg = inp["table"].reshape(g, h_g, th, tw).astype(dt)
    m1 = jnp.einsum(
        "bgynt,ghtu->bgynuh", wy, tblg, preferred_element_type=jnp.float32
    ).astype(dt)
    bias = jnp.einsum(
        "bgynuh,bgwnu->bghywn", m1, wx, preferred_element_type=jnp.float32
    )
    return bias.reshape(B, heads, H * W, Ns)


def v1(inp):
    g, heads, H, W, Ns, th, tw = inp["meta"]
    h_g = heads // g
    dt = inp["dtype"]
    wy, wx = tap_weights(inp)
    tblg = inp["table"].reshape(g, h_g, th, tw).astype(dt)
    # m1 with u minor, h ahead of it: (B, g, H, Ns, h, u)
    m1 = jnp.einsum(
        "bgynt,ghtu->bgynhu", wy, tblg, preferred_element_type=jnp.float32
    ).astype(dt)
    bias = jnp.einsum(
        "bgynhu,bgwnu->bghywn", m1, wx, preferred_element_type=jnp.float32
    )
    return bias.reshape(B, heads, H * W, Ns)


def v2(inp):
    """Explicit n-batched dot_generals with pre-arranged layouts."""
    g, heads, H, W, Ns, th, tw = inp["meta"]
    h_g = heads // g
    dt = inp["dtype"]
    wy, wx = tap_weights(inp)
    # e1 as one big matmul: (B*g*H*Ns, th) @ (th, h*tw) per g
    t2 = inp["table"].reshape(g, h_g, th, tw).transpose(0, 2, 1, 3)
    t2 = t2.reshape(g, th, h_g * tw).astype(dt)
    m1 = jnp.einsum(
        "bgPt,gtU->bgPU",
        wy.reshape(B, g, H * Ns, th),
        t2,
        preferred_element_type=jnp.float32,
    ).astype(dt)  # (B, g, H*Ns, h*tw)
    m1 = m1.reshape(B, g, H, Ns, h_g, tw).transpose(0, 1, 3, 4, 2, 5)
    m1 = m1.reshape(B, g, Ns, h_g * H, tw)
    wxT = wx.transpose(0, 1, 3, 4, 2)  # (B, g, Ns, tw, W)
    bias = jnp.einsum(
        "bgnMu,bgnuw->bgnMw", m1, wxT, preferred_element_type=jnp.float32
    )  # (B, g, Ns, h*H, W)
    bias = bias.reshape(B, g, Ns, h_g, H, W)
    bias = bias.transpose(0, 1, 3, 4, 5, 2).reshape(B, heads, H * W, Ns)
    return bias


def v3(inp, rank=8):
    """Low-rank table: bias_r = (wy @ Uy_r) * (wx @ Vx_r), summed over r."""
    g, heads, H, W, Ns, th, tw = inp["meta"]
    h_g = heads // g
    dt = inp["dtype"]
    wy, wx = tap_weights(inp)
    U, V = inp["U"], inp["V"]
    fy = jnp.einsum(
        "bgynt,ghtr->bgynhr", wy, U, preferred_element_type=jnp.float32
    ).astype(dt)  # (B,g,H,Ns,h,r)
    fx = jnp.einsum(
        "bgwnt,ghtr->bgwnhr", wx, V, preferred_element_type=jnp.float32
    ).astype(dt)  # (B,g,W,Ns,h,r)
    bias = jnp.einsum(
        "bgynhr,bgwnhr->bghywn", fy, fx, preferred_element_type=jnp.float32
    )
    return bias.reshape(B, heads, H * W, Ns)


def ctl_attn(inp):
    """Control: the qk^T + av einsums at the same stage shapes."""
    g, heads, H, W, Ns, th, tw = inp["meta"]
    dt = inp["dtype"]
    q, k, v = inp["q"], inp["k"], inp["v"]
    attn = jnp.einsum("bmhc,bnhc->bhmn", q, k, preferred_element_type=jnp.float32)
    attn = jax.nn.softmax(attn, axis=-1).astype(dt)
    out = jnp.einsum("bhmn,bnhc->bmhc", attn, v, preferred_element_type=jnp.float32)
    return out


def flops(stage, variant):
    s = STAGES[stage]
    g, heads, H, Ns, th = s["g"], s["heads"], s["H"], s["Ns"], s["th"]
    W, tw, h_g = H, th, heads // g
    if variant in ("v0", "v1", "v2"):
        e1 = B * g * H * Ns * th * tw * h_g
        e2 = B * heads * H * W * Ns * tw
        return 2 * (e1 + e2)
    if variant == "v3":
        r = 8
        e1 = B * g * (H + W) * Ns * th * r * h_g
        e2 = B * heads * H * W * Ns * r
        return 2 * (e1 + e2)
    if variant == "ctl":
        return 2 * (2 * B * heads * H * W * Ns * 32)
    return 0


def run(stage, fns, iters, dtype=jnp.bfloat16):
    inp = make_inputs(stage, dtype=dtype)
    results = {}
    ref = None
    meta, dt = inp["meta"], inp["dtype"]
    arr_keys = [k for k in inp if k not in ("meta", "dtype")]
    arrs = tuple(inp[k] for k in arr_keys)

    def make_jf(fn):
        def wrapped(*arr_vals):
            d = dict(zip(arr_keys, arr_vals))
            d["meta"] = meta
            d["dtype"] = dt
            return fn(d)

        jitted = jax.jit(wrapped)
        return lambda: jitted(*arrs)

    for name, fn in fns.items():
        jf = make_jf(fn)
        out = jf()
        out.block_until_ready()
        if name in ("v0", "v1", "v2"):
            onp = np.asarray(jax.device_get(out)).astype(np.float32)
            if ref is None:
                ref = onp
            else:
                err = np.abs(onp - ref).max()
                assert err < 0.05, (name, err)
        _fetch(out)
        t0 = time.perf_counter()
        o = None
        for _ in range(iters):
            o = jf()
        _fetch(o)
        elapsed = (time.perf_counter() - t0) / iters
        f = flops(stage, name)
        results[name] = (elapsed, f / elapsed / 1e12)
        print(
            f"stage{stage} {name}: {elapsed*1e3:8.3f} ms  {f/elapsed/1e12:7.2f} TF/s"
            f"  ({f/1e9:.2f} GF)",
            flush=True,
        )
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", type=int, nargs="*", default=[0, 1, 2, 3])
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--variants", nargs="*", default=["v0", "v1", "v2", "v3", "ctl"])
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    print("backend:", jax.default_backend(), jax.devices()[0].device_kind)
    all_fns = {"v0": v0, "v1": v1, "v2": v2, "v3": v3, "ctl": ctl_attn}
    fns = {k: all_fns[k] for k in args.variants}
    totals = {}
    for st in args.stage:
        res = run(st, fns, args.iters,
                  dtype=jnp.float32 if args.cpu else jnp.bfloat16)
        for name, (dt, tf) in res.items():
            totals[name] = totals.get(name, 0.0) + dt * D_BLOCKS[st]
    print("\nper-forward totals (sum over D blocks):")
    for name, t in totals.items():
        print(f"  {name}: {t*1e3:.2f} ms")


if __name__ == "__main__":
    main()
