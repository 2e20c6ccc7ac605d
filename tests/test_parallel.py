"""Sharded train/eval step on the virtual 8-device CPU mesh."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from dat_segmentation_tpu.configs import get_config
from dat_segmentation_tpu.models import build_model
from dat_segmentation_tpu.parallel import (
    TrainState,
    batch_sharding,
    create_train_state,
    make_eval_step,
    make_mesh,
    make_train_step,
)
from dat_segmentation_tpu.parallel.mesh import shard_batch
from dat_segmentation_tpu.train import make_optimizer, warmup_poly_schedule


def _tiny_seg_model():
    cfg = get_config("upn_tiny_160k_dp03_lr6")
    bb = dataclasses.replace(
        cfg.model.backbone,
        depths=(1, 1, 1, 1),
        dims=(16, 32, 64, 128),
        dim_stem=16,
        heads=(2, 2, 4, 4),
        groups=(1, 2, 2, 4),
        stage_spec=(("D",), ("D",), ("X",), ("D",)),
        drop_path_rate=0.1,
    )
    model_cfg = dataclasses.replace(
        cfg.model,
        backbone=bb,
        decode_head=dataclasses.replace(cfg.model.decode_head, channels=32),
        auxiliary_head=dataclasses.replace(
            cfg.model.auxiliary_head, channels=16
        ),
    )
    return build_model(model_cfg), cfg


def test_sharded_train_step_runs_and_replicates():
    mesh = make_mesh({"data": 8})
    model, cfg = _tiny_seg_model()
    sched = warmup_poly_schedule(1e-2, 100, warmup_iters=0)
    sample = jnp.zeros((8, 64, 64, 3))

    state = create_train_state(
        model,
        make_optimizer(sched, None, weight_decay=0.01),
        jax.random.PRNGKey(0),
        sample,
    )
    # optimizer needs params for the decay mask -> rebuild with params
    tx = make_optimizer(sched, state.params, weight_decay=0.01)
    state = TrainState(
        step=state.step,
        params=state.params,
        opt_state=tx.init(state.params),
        batch_stats=state.batch_stats,
        tx=tx,
    )

    step = make_train_step(
        model, mesh, task="seg", num_classes=150, compute_dtype=jnp.float32
    )
    rng = np.random.RandomState(0)
    batch = {
        "image": jnp.asarray(rng.randn(8, 64, 64, 3).astype(np.float32)),
        "label": jnp.asarray(rng.randint(0, 150, (8, 64, 64))),
    }
    batch = shard_batch(mesh, batch)
    p0 = jax.tree.leaves(state.params)[0].copy()
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert int(state.step) == 1
    assert np.isfinite(float(metrics["loss"]))
    assert metrics["inter"].shape == (150,)
    # params actually updated
    p1 = jax.tree.leaves(state.params)[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p1))
    # second step (jit cache) works
    state, metrics2 = step(state, batch, jax.random.PRNGKey(1))
    assert int(state.step) == 2


def test_sharded_matches_single_device():
    """DP over 8 devices must equal the same step on 1 device (bitwise-ish)."""
    model, _ = _tiny_seg_model()
    sched = warmup_poly_schedule(1e-3, 100, warmup_iters=0)
    sample = jnp.zeros((8, 64, 64, 3))

    def fresh_state():
        st = create_train_state(
            model,
            make_optimizer(sched, None),
            jax.random.PRNGKey(0),
            sample,
        )
        tx = make_optimizer(sched, st.params)
        return TrainState(
            step=st.step, params=st.params, opt_state=tx.init(st.params),
            batch_stats=st.batch_stats, tx=tx,
        )

    rng = np.random.RandomState(1)
    batch = {
        "image": jnp.asarray(rng.randn(8, 64, 64, 3).astype(np.float32)),
        "label": jnp.asarray(rng.randint(0, 150, (8, 64, 64))),
    }

    mesh8 = make_mesh({"data": 8})
    mesh1 = make_mesh({"data": 1}, devices=jax.devices()[:1])

    outs = {}
    for name, mesh in [("dp8", mesh8), ("dp1", mesh1)]:
        step = make_train_step(
            model, mesh, task="seg", num_classes=150,
            compute_dtype=jnp.float32,
        )
        st, m = step(fresh_state(), shard_batch(mesh, batch), jax.random.PRNGKey(2))
        outs[name] = (
            np.asarray(jax.tree.leaves(st.params)[0]),
            float(m["loss"]),
        )
    np.testing.assert_allclose(outs["dp8"][1], outs["dp1"][1], rtol=1e-5)
    np.testing.assert_allclose(
        outs["dp8"][0], outs["dp1"][0], rtol=1e-4, atol=1e-6
    )


def test_eval_step_sharded():
    mesh = make_mesh({"data": 8})
    model, _ = _tiny_seg_model()
    sample = jnp.zeros((8, 64, 64, 3))
    state = create_train_state(
        model,
        make_optimizer(warmup_poly_schedule(1e-3, 10), None),
        jax.random.PRNGKey(0),
        sample,
    )
    fwd = make_eval_step(model, mesh, compute_dtype=jnp.float32)
    img = shard_batch(mesh, {"image": jnp.zeros((8, 64, 64, 3))})["image"]
    logits = fwd(state.params, state.batch_stats, img)
    assert logits.shape == (8, 64, 64, 150)


def test_shard_batch_produces_global_sharded_array():
    """shard_batch on the 8-device mesh: global shape preserved, batch dim
    split across 'data'; process helpers give sane single-process values."""
    from dat_segmentation_tpu.parallel.mesh import (
        local_batch_size,
        process_shard_info,
    )

    mesh = make_mesh({"data": 8})
    batch = {
        "image": np.arange(8 * 4 * 4 * 3, dtype=np.float32).reshape(8, 4, 4, 3),
        "label": np.arange(8, dtype=np.int32),
    }
    sharded = shard_batch(mesh, batch)
    assert sharded["image"].shape == (8, 4, 4, 3)
    assert sharded["label"].shape == (8,)
    # each device holds exactly one batch row
    shards = sharded["image"].addressable_shards
    assert len(shards) == 8
    assert all(s.data.shape == (1, 4, 4, 3) for s in shards)
    np.testing.assert_allclose(np.asarray(sharded["image"]), batch["image"])

    assert process_shard_info() == (0, 1)
    assert local_batch_size(16) == 16


def test_spatial_partition_matches_dp():
    """dp4 x sp2 (image H sharded over 'spatial', GSPMD halo exchange)
    must match plain dp8 numerics: same loss, same updated params."""
    model, _ = _tiny_seg_model()
    sched = warmup_poly_schedule(1e-3, 100, warmup_iters=0)
    sample = jnp.zeros((8, 64, 64, 3))

    def fresh_state():
        st = create_train_state(
            model,
            make_optimizer(sched, None),
            jax.random.PRNGKey(0),
            sample,
        )
        tx = make_optimizer(sched, st.params)
        return TrainState(
            step=st.step, params=st.params, opt_state=tx.init(st.params),
            batch_stats=st.batch_stats, tx=tx,
        )

    rng = np.random.RandomState(3)
    batch = {
        "image": jnp.asarray(rng.randn(8, 64, 64, 3).astype(np.float32)),
        "label": jnp.asarray(rng.randint(0, 150, (8, 64, 64))),
    }

    outs = {}
    for name, shape in [
        ("dp8", {"data": 8}),
        ("dp4sp2", {"data": 4, "spatial": 2}),
    ]:
        mesh = make_mesh(shape)
        sharded = shard_batch(mesh, batch)
        if name == "dp4sp2":
            # image/label really H-sharded: (2, 32, ...) per device
            assert all(
                s.data.shape == (2, 32, 64, 3)
                for s in sharded["image"].addressable_shards
            )
            assert all(
                s.data.shape == (2, 32, 64)
                for s in sharded["label"].addressable_shards
            )
        step = make_train_step(
            model, mesh, task="seg", num_classes=150,
            compute_dtype=jnp.float32,
        )
        st, m = step(fresh_state(), sharded, jax.random.PRNGKey(2))
        outs[name] = (
            np.asarray(jax.tree.leaves(st.params)[0]),
            float(m["loss"]),
            np.asarray(m["inter"]),
        )
    np.testing.assert_allclose(outs["dp8"][1], outs["dp4sp2"][1], rtol=1e-5)
    np.testing.assert_allclose(
        outs["dp8"][0], outs["dp4sp2"][0], rtol=1e-4, atol=1e-6
    )
    np.testing.assert_array_equal(outs["dp8"][2], outs["dp4sp2"][2])


def test_spatial_partition_eval_step():
    mesh = make_mesh({"data": 2, "spatial": 4})
    model, _ = _tiny_seg_model()
    sample = jnp.zeros((2, 64, 64, 3))
    state = create_train_state(
        model,
        make_optimizer(warmup_poly_schedule(1e-3, 10), None),
        jax.random.PRNGKey(0),
        sample,
    )
    fwd = make_eval_step(model, mesh, compute_dtype=jnp.float32)
    img = shard_batch(mesh, {"image": jnp.zeros((2, 64, 64, 3))})["image"]
    assert all(
        s.data.shape == (1, 16, 64, 3) for s in img.addressable_shards
    )
    logits = fwd(state.params, state.batch_stats, img)
    assert logits.shape == (2, 64, 64, 150)


def test_fsdp_matches_replicated_dp():
    """ZeRO param+opt sharding (fsdp=True) must match replicated-dp8
    numerics exactly: same losses and same params after 2 steps — and the
    big leaves must REALLY live sharded over 'data'."""
    from dat_segmentation_tpu.parallel import shard_state, state_shardings
    from dat_segmentation_tpu.parallel.mesh import fsdp_sharding

    model, _ = _tiny_seg_model()
    sched = warmup_poly_schedule(1e-3, 100, warmup_iters=0)
    sample = jnp.zeros((8, 64, 64, 3))

    def fresh_state():
        st = create_train_state(
            model,
            make_optimizer(sched, None),
            jax.random.PRNGKey(0),
            sample,
        )
        tx = make_optimizer(sched, st.params)
        return TrainState(
            step=st.step, params=st.params, opt_state=tx.init(st.params),
            batch_stats=st.batch_stats, tx=tx,
        )

    rng = np.random.RandomState(7)
    batches = [
        {
            "image": jnp.asarray(rng.randn(8, 64, 64, 3).astype(np.float32)),
            "label": jnp.asarray(rng.randint(0, 150, (8, 64, 64))),
        }
        for _ in range(2)
    ]
    mesh = make_mesh({"data": 8})

    outs = {}
    for name, fsdp in [("repl", False), ("fsdp", True)]:
        state = fresh_state()
        if fsdp:
            state = shard_state(mesh, state, fsdp=True)
            # at least one param leaf must be genuinely sharded 8 ways
            sharded_leaves = [
                x for x in jax.tree.leaves(state.params)
                if len(x.addressable_shards) == 8
                and x.addressable_shards[0].data.shape != x.shape
            ]
            assert sharded_leaves, "no param leaf actually sharded"
            # and its AdamW mu twin too
            mu_sharded = [
                x for x in jax.tree.leaves(state.opt_state)
                if hasattr(x, "addressable_shards")
                and x.ndim >= 1
                and x.addressable_shards[0].data.shape != x.shape
            ]
            assert mu_sharded, "no optimizer leaf actually sharded"
        step = make_train_step(
            model, mesh, task="seg", num_classes=150,
            compute_dtype=jnp.float32, fsdp=fsdp, state=state,
        )
        losses = []
        for b in batches:
            state, m = step(state, shard_batch(mesh, b), jax.random.PRNGKey(2))
            losses.append(float(m["loss"]))
        outs[name] = (
            losses,
            np.asarray(jax.tree.leaves(state.params)[0]),
        )
    np.testing.assert_allclose(outs["repl"][0], outs["fsdp"][0], rtol=1e-5)
    np.testing.assert_allclose(
        outs["repl"][1], outs["fsdp"][1], rtol=1e-4, atol=1e-6
    )

    # sharding rule unit checks: tiny/indivisible leaves stay replicated
    assert fsdp_sharding(mesh, jnp.zeros((128,))).spec == ()  # < min_size
    assert fsdp_sharding(mesh, jnp.zeros((3, 3, 333, 7))).spec == ()
    spec = fsdp_sharding(mesh, jnp.zeros((3, 3, 256, 512))).spec
    assert tuple(spec) == (None, None, None, "data")


def test_tensor_parallel_model_axis_matches_dp():
    """fsdp='model' on a dp4 x tp2 mesh (weights sharded over 'model',
    batch over 'data'; GSPMD all-reduces partial matmuls) must match
    plain replicated dp8 numerics."""
    from dat_segmentation_tpu.parallel import shard_state

    model, _ = _tiny_seg_model()
    sched = warmup_poly_schedule(1e-3, 100, warmup_iters=0)
    sample = jnp.zeros((8, 64, 64, 3))

    def fresh_state():  # per leg: the step donates its input buffers
        st = create_train_state(
            model, make_optimizer(sched, None), jax.random.PRNGKey(0), sample
        )
        tx = make_optimizer(sched, st.params)
        return TrainState(
            step=st.step, params=st.params, opt_state=tx.init(st.params),
            batch_stats=st.batch_stats, tx=tx,
        )

    rng = np.random.RandomState(11)
    batch = {
        "image": jnp.asarray(rng.randn(8, 64, 64, 3).astype(np.float32)),
        "label": jnp.asarray(rng.randint(0, 150, (8, 64, 64))),
    }

    outs = {}
    for name, shape, fsdp in [
        ("dp8", {"data": 8}, False),
        ("dp4tp2", {"data": 4, "model": 2}, "model"),
    ]:
        mesh = make_mesh(shape)
        state = fresh_state()
        if fsdp:
            state = shard_state(mesh, state, fsdp=fsdp)
        step = make_train_step(
            model, mesh, task="seg", num_classes=150,
            compute_dtype=jnp.float32, fsdp=fsdp, state=state,
        )
        state, m = step(state, shard_batch(mesh, batch), jax.random.PRNGKey(2))
        outs[name] = (
            float(m["loss"]),
            np.asarray(jax.tree.leaves(state.params)[0]),
        )
    np.testing.assert_allclose(outs["dp8"][0], outs["dp4tp2"][0], rtol=1e-5)
    np.testing.assert_allclose(
        outs["dp8"][1], outs["dp4tp2"][1], rtol=1e-4, atol=1e-6
    )
