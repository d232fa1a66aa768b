"""Fused ReLU+maxpool Pallas kernel vs the slice-chain reference form.

The kernel replaces ``maxpool3d(relu(x))`` in the backbone stem on TPU
(``models/layers.relu_maxpool_stem``); these tests pin value and gradient
equality in interpret mode.  Random float inputs have no exact in-window
ties, so the argmax-routed backward must match jnp's max-chain gradient
exactly.
"""

import numpy as np

import jax
import jax.numpy as jnp

from dpc_tpu.models import layers as L
from dpc_tpu.ops import maxpool_pallas


def _ref(x):
    return L.maxpool3d(jax.nn.relu(x), (1, 3, 3), (1, 2, 2), (0, 1, 1))


def _rand(shape, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(size=shape).astype(np.float32))


def test_forward_matches_reference():
    x = _rand((2, 3, 8, 8, 16))
    np.testing.assert_array_equal(
        np.asarray(maxpool_pallas.maxpool_relu_3x3s2(x)),
        np.asarray(_ref(x)))


def test_forward_nonsquare_and_blockpad():
    # N·T = 5 forces grid padding when the block covers multiple rows
    x = _rand((5, 1, 4, 12, 8), seed=1)
    np.testing.assert_array_equal(
        np.asarray(maxpool_pallas.maxpool_relu_3x3s2(x)),
        np.asarray(_ref(x)))


def test_gradient_matches_reference():
    x = _rand((2, 2, 8, 8, 8), seed=2)
    g_ref = jax.grad(lambda x: jnp.sum(jnp.square(_ref(x))))(x)
    g_ker = jax.grad(lambda x: jnp.sum(jnp.square(
        maxpool_pallas.maxpool_relu_3x3s2(x))))(x)
    np.testing.assert_allclose(np.asarray(g_ker), np.asarray(g_ref),
                               rtol=1e-6, atol=0)


def test_gradient_relu_gate():
    # all-negative windows: output 0, gradient must be exactly 0
    x = -jnp.abs(_rand((1, 1, 4, 4, 8), seed=3)) - 0.1
    out = maxpool_pallas.maxpool_relu_3x3s2(x)
    np.testing.assert_array_equal(np.asarray(out), 0.0)
    g = jax.grad(lambda x: jnp.sum(maxpool_pallas.maxpool_relu_3x3s2(x)))(x)
    np.testing.assert_array_equal(np.asarray(g), 0.0)


def test_dispatch_helper_fallback_is_reference():
    x = _rand((2, 2, 6, 6, 4), seed=4)
    np.testing.assert_array_equal(
        np.asarray(L.relu_maxpool_stem(x, impl="xla")),
        np.asarray(_ref(x)))
    np.testing.assert_array_equal(
        np.asarray(L.relu_maxpool_stem(x, impl="pallas")),
        np.asarray(_ref(x)))


def test_eqroute_forward_matches_reference():
    x = _rand((3, 2, 8, 12, 8), seed=6)
    np.testing.assert_array_equal(
        np.asarray(L.relu_maxpool_stem(x, impl="eqroute")),
        np.asarray(_ref(x)))


def test_eqroute_gradient_matches_reference():
    # no in-window ties in random f32 data ⇒ equality routing must agree
    # exactly with the max-chain gradient
    x = _rand((2, 2, 8, 8, 8), seed=7)
    g_ref = jax.grad(lambda x: jnp.sum(jnp.square(_ref(x))))(x)
    g_eq = jax.grad(lambda x: jnp.sum(jnp.square(
        L.relu_maxpool_stem(x, impl="eqroute"))))(x)
    np.testing.assert_allclose(np.asarray(g_eq), np.asarray(g_ref),
                               rtol=1e-6, atol=0)


def test_eqroute_gradient_relu_gate():
    x = -jnp.abs(_rand((1, 1, 4, 4, 8), seed=8)) - 0.1
    g = jax.grad(lambda x: jnp.sum(
        L.relu_maxpool_stem(x, impl="eqroute")))(x)
    np.testing.assert_array_equal(np.asarray(g), 0.0)


def test_eqroute_boundary_windows():
    # single window row/col exercises the shifted -inf/0 fills
    x = _rand((1, 1, 2, 2, 4), seed=9)
    np.testing.assert_array_equal(
        np.asarray(L.relu_maxpool_stem(x, impl="eqroute")),
        np.asarray(_ref(x)))
    g_ref = jax.grad(lambda x: jnp.sum(jnp.square(_ref(x))))(x)
    g_eq = jax.grad(lambda x: jnp.sum(jnp.square(
        L.relu_maxpool_stem(x, impl="eqroute"))))(x)
    np.testing.assert_allclose(np.asarray(g_eq), np.asarray(g_ref),
                               rtol=1e-6, atol=0)


def test_bfloat16_path():
    x = _rand((2, 1, 8, 8, 8), seed=5).astype(jnp.bfloat16)
    np.testing.assert_array_equal(
        np.asarray(maxpool_pallas.maxpool_relu_3x3s2(x).astype(jnp.float32)),
        np.asarray(_ref(x).astype(jnp.float32)))


def test_sas_forward_matches_reference():
    # odd H/W too — "sas" has no even-size restriction
    for shape, seed in (((3, 2, 8, 12, 8), 10), ((2, 1, 7, 9, 4), 11)):
        x = _rand(shape, seed=seed)
        np.testing.assert_array_equal(
            np.asarray(L.relu_maxpool_stem(x, impl="sas")),
            np.asarray(_ref(x)))


def test_sas_gradient_matches_reference():
    # random f32 has no in-window ties ⇒ first-max routing == max-chain grad
    x = _rand((2, 2, 8, 8, 8), seed=12)
    g_ref = jax.grad(lambda x: jnp.sum(jnp.square(_ref(x))))(x)
    g_sas = jax.grad(lambda x: jnp.sum(jnp.square(
        L.relu_maxpool_stem(x, impl="sas"))))(x)
    np.testing.assert_allclose(np.asarray(g_sas), np.asarray(g_ref),
                               rtol=1e-6, atol=0)


def test_sas_gradient_relu_gate():
    x = -jnp.abs(_rand((1, 1, 4, 4, 8), seed=13)) - 0.1
    g = jax.grad(lambda x: jnp.sum(L.relu_maxpool_stem(x, impl="sas")))(x)
    np.testing.assert_array_equal(np.asarray(g), 0.0)


def test_sas_tie_routing_is_single_winner():
    # constant-positive input: every window ties everywhere.  torch routes
    # each window's gradient to exactly ONE position, so the total incoming
    # gradient mass must be preserved (eqroute would multiply it).
    x = jnp.ones((1, 1, 8, 8, 1), jnp.float32)
    out = L.relu_maxpool_stem(x, impl="sas")
    g = jax.grad(lambda x: jnp.sum(
        L.relu_maxpool_stem(x, impl="sas")))(x)
    assert float(jnp.sum(g)) == out.size  # one unit of grad per window


def test_sas_composes_with_shard_map():
    # the whole reason the custom VJP exists: reduce_window max-grad does
    # not linearise under shard_map; the scatter primitive must.
    from functools import partial
    from jax.sharding import Mesh, PartitionSpec as P

    devs = np.array(jax.devices("cpu")[:2])
    mesh = Mesh(devs, ("data",))
    x = _rand((4, 1, 8, 8, 4), seed=14)

    @jax.jit
    @partial(jax.shard_map, mesh=mesh, in_specs=P("data"), out_specs=P())
    def loss(x):
        return jax.lax.psum(
            jnp.sum(jnp.square(L.relu_maxpool_stem(x, impl="sas"))), "data")

    g = jax.grad(loss)(x)
    g_ref = jax.grad(lambda x: jnp.sum(jnp.square(_ref(x))))(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=1e-6, atol=0)


class TestFusedStem:
    """layers.fused_stem == conv → BN(batch) → ReLU → maxpool, exactly."""

    def _mk(self, seed, cin=3, cout=8, negate_some=True):
        rng = np.random.default_rng(seed)
        conv_p = {"w": jnp.asarray(
            rng.normal(size=(1, 7, 7, cin, cout)).astype(np.float32) * 0.1)}
        gamma = rng.uniform(0.5, 1.5, cout).astype(np.float32)
        bias = rng.normal(size=cout).astype(np.float32)
        if negate_some:
            gamma[::3] *= -1.0          # negative BN scales must stay exact
            gamma[1] = 0.0              # and the degenerate γ=0 channel:
            bias[1] = 0.7               # β > 0 keeps relu' = 1 there, so a
            # frozen dL/dγ (the jnp.sign(γ) fold bug) cannot hide behind a
            # dead ReLU
        bn_p = {"scale": jnp.asarray(gamma),
                "bias": jnp.asarray(bias)}
        x = jnp.asarray(rng.normal(size=(2, 3, 16, 16, cin))
                        .astype(np.float32))
        return conv_p, bn_p, x

    @staticmethod
    def _unfused(conv_p, bn_p, x):
        h = L.conv3d(conv_p, x, (1, 2, 2), (0, 3, 3))
        h, _ = L.batchnorm(bn_p, None, h, train=True)
        return L.maxpool3d(jax.nn.relu(h), (1, 3, 3), (1, 2, 2), (0, 1, 1))

    def test_values_match(self):
        conv_p, bn_p, x = self._mk(20)
        got = L.fused_stem(conv_p, bn_p, x)[0]
        want = self._unfused(conv_p, bn_p, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)

    def test_gradients_match(self):
        conv_p, bn_p, x = self._mk(21)

        def loss(fn):
            return lambda cp, bp, x: jnp.sum(jnp.square(fn(cp, bp, x)))

        g_f = jax.grad(loss(lambda *a: L.fused_stem(*a)[0]),
                       argnums=(0, 1, 2))(conv_p, bn_p, x)
        g_u = jax.grad(loss(self._unfused), argnums=(0, 1, 2))(
            conv_p, bn_p, x)
        # γ=0 makes the pre-pool activation CONSTANT (y = β everywhere), so
        # the max-pool ties at every window and dL/dγ is a tie-dependent
        # subgradient — the two formulations legitimately select different
        # valid subgradients there.  Compare everything else exactly...
        mask = np.ones(8, bool)
        mask[1] = False
        np.testing.assert_allclose(np.asarray(g_f[1]["scale"])[mask],
                                   np.asarray(g_u[1]["scale"])[mask],
                                   rtol=2e-4, atol=2e-4)
        for a, b in zip(jax.tree.leaves((g_f[0], g_f[1]["bias"], g_f[2])),
                        jax.tree.leaves((g_u[0], g_u[1]["bias"], g_u[2]))):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-4)
        # ...and require the γ=0 scale gradient to be LIVE in both (the
        # naive sign(γ) fold silently froze it to exactly 0, stranding
        # pruned/imported channels forever)
        assert abs(float(g_u[1]["scale"][1])) > 1e-3
        assert abs(float(g_f[1]["scale"][1])) > 1e-3

    def test_backbone_auto_switch_matches(self):
        # whole-backbone forward: fused stem vs unfused, same params
        from dpc_tpu.models import resnet2d3d
        key = jax.random.PRNGKey(3)
        params, state = resnet2d3d.init_resnet2d3d(
            key, "resnet18", track_running_stats=False)
        x = _rand((1, 8, 32, 32, 3), seed=22)
        out_u, _ = resnet2d3d.apply_resnet2d3d(
            params, state, x, network="resnet18", stem_impl="unfused")
        out_f, _ = resnet2d3d.apply_resnet2d3d(
            params, state, x, network="resnet18", stem_impl="fused")
        # the stem itself agrees to ~5e-7 (test_values_match); the chain of
        # ~20 batch-stat BNs amplifies that rounding by ~1e4 at batch 1, so
        # whole-net agreement is necessarily loose
        np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_u),
                                   rtol=0.05, atol=0.05)

    def test_conv_bias_folds(self):
        conv_p, bn_p, x = self._mk(23)
        rng = np.random.default_rng(24)
        conv_p["b"] = jnp.asarray(
            rng.normal(size=conv_p["w"].shape[-1]).astype(np.float32))
        got = L.fused_stem(conv_p, bn_p, x)[0]
        want = self._unfused(conv_p, bn_p, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)


def test_fused_stem_composes_with_shard_map():
    """Multi-chip TPU uses fused_stem inside shard_map (with and without
    cross-replica stats); both must linearise and match the unfused form
    computed on the full batch."""
    from functools import partial
    from jax.sharding import Mesh, PartitionSpec as P

    rng = np.random.default_rng(30)
    conv_p = {"w": jnp.asarray(
        rng.normal(size=(1, 7, 7, 3, 8)).astype(np.float32) * 0.1)}
    gamma = rng.uniform(0.5, 1.5, 8).astype(np.float32)
    gamma[::3] *= -1.0
    bn_p = {"scale": jnp.asarray(gamma),
            "bias": jnp.asarray(rng.normal(size=8).astype(np.float32))}
    x = jnp.asarray(rng.normal(size=(4, 2, 8, 8, 3)).astype(np.float32))

    mesh = Mesh(np.array(jax.devices("cpu")[:2]), ("data",))

    @jax.jit
    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(), P(), P("data")), out_specs=P())
    def loss_syncbn(cp, bp, x):
        y = L.fused_stem(cp, bp, x, axis_name="data")[0]
        return jax.lax.psum(jnp.sum(jnp.square(y)), "data")

    def loss_full(cp, bp, x):      # unfused, full-batch stats
        h = L.conv3d(cp, x, (1, 2, 2), (0, 3, 3))
        h, _ = L.batchnorm(bp, None, h, train=True)
        h = L.maxpool3d(jax.nn.relu(h), (1, 3, 3), (1, 2, 2), (0, 1, 1))
        return jnp.sum(jnp.square(h))

    # cross-replica stats == full-batch stats ⇒ values and grads agree
    np.testing.assert_allclose(float(loss_syncbn(conv_p, bn_p, x)),
                               float(loss_full(conv_p, bn_p, x)),
                               rtol=1e-5)
    g_s = jax.grad(loss_syncbn, argnums=(0, 1, 2))(conv_p, bn_p, x)
    g_f = jax.grad(loss_full, argnums=(0, 1, 2))(conv_p, bn_p, x)
    for a, b in zip(jax.tree.leaves(g_s), jax.tree.leaves(g_f)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)

    # per-shard stats (the DataParallel-parity default) also linearises
    @jax.jit
    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(), P(), P("data")), out_specs=P())
    def loss_local(cp, bp, x):
        y = L.fused_stem(cp, bp, x)[0]
        return jax.lax.psum(jnp.sum(jnp.square(y)), "data")

    g = jax.grad(loss_local, argnums=2)(conv_p, bn_p, x)
    assert np.isfinite(np.asarray(g)).all()


class TestFusedStemRunningStats:
    """The LC (track_running_stats=True) BN modes of fused_stem."""

    def _mk(self, seed):
        rng = np.random.default_rng(seed)
        conv_p = {"w": jnp.asarray(
            rng.normal(size=(1, 7, 7, 3, 8)).astype(np.float32) * 0.1)}
        gamma = rng.uniform(0.5, 1.5, 8).astype(np.float32)
        gamma[::3] *= -1.0
        bn_p = {"scale": jnp.asarray(gamma),
                "bias": jnp.asarray(rng.normal(size=8).astype(np.float32))}
        state = {"mean": jnp.asarray(
            rng.normal(size=8).astype(np.float32) * 0.3),
            "var": jnp.asarray(
                rng.uniform(0.5, 2.0, 8).astype(np.float32))}
        x = jnp.asarray(rng.normal(size=(2, 3, 16, 16, 3))
                        .astype(np.float32))
        return conv_p, bn_p, state, x

    @staticmethod
    def _unfused(conv_p, bn_p, state, x, train):
        h = L.conv3d(conv_p, x, (1, 2, 2), (0, 3, 3))
        h, ns = L.batchnorm(bn_p, state, h, train=train)
        return L.maxpool3d(jax.nn.relu(h),
                           (1, 3, 3), (1, 2, 2), (0, 1, 1)), ns

    def test_train_mode_values_and_ema(self):
        conv_p, bn_p, state, x = self._mk(40)
        got, ns_f = L.fused_stem(conv_p, bn_p, x, state=state, train=True)
        want, ns_u = self._unfused(conv_p, bn_p, state, x, True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)
        # the EMA must track the TRUE (sign-recovered) mean and var
        for k in ("mean", "var"):
            np.testing.assert_allclose(np.asarray(ns_f[k]),
                                       np.asarray(ns_u[k]),
                                       rtol=1e-5, atol=1e-6)

    def test_eval_mode_uses_running_stats(self):
        conv_p, bn_p, state, x = self._mk(41)
        got, ns_f = L.fused_stem(conv_p, bn_p, x, state=state, train=False)
        want, _ = self._unfused(conv_p, bn_p, state, x, False)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)
        assert ns_f is state  # eval must not touch the EMA

    def test_backbone_track_mode_matches(self):
        from dpc_tpu.models import resnet2d3d
        key = jax.random.PRNGKey(5)
        params, state = resnet2d3d.init_resnet2d3d(
            key, "resnet18", track_running_stats=True)
        x = _rand((1, 8, 32, 32, 3), seed=42)
        for train in (True, False):
            out_u, ns_u = resnet2d3d.apply_resnet2d3d(
                params, state, x, network="resnet18", train=train,
                stem_impl="unfused")
            out_f, ns_f = resnet2d3d.apply_resnet2d3d(
                params, state, x, network="resnet18", train=train,
                stem_impl="fused")
            np.testing.assert_allclose(np.asarray(out_f),
                                       np.asarray(out_u),
                                       rtol=0.05, atol=0.05)
            np.testing.assert_allclose(
                np.asarray(ns_f["stem"]["bn"]["mean"]),
                np.asarray(ns_u["stem"]["bn"]["mean"]),
                rtol=1e-4, atol=1e-5)


class TestEqKernelBackward:
    """maxpool_3x3s2_eq: the single-pass input-resolution Pallas backward
    (round-3; measured 9x SLOWER than SAS on-chip — kept as the verified
    negative result + pattern, docs/RESULTS.md round-3 roofline study)."""

    def test_forward_matches_maxpool3d(self):
        z = _rand((2, 3, 16, 16, 8), seed=20)
        ref = L.maxpool3d(z, (1, 3, 3), (1, 2, 2), (0, 1, 1))
        got = maxpool_pallas.maxpool_3x3s2_eq(z)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def test_gradient_matches_on_tie_free_data(self):
        z = _rand((2, 2, 16, 16, 8), seed=21)
        g_ref = jax.grad(lambda v: jnp.sum(
            L.maxpool3d(v, (1, 3, 3), (1, 2, 2), (0, 1, 1)) ** 2))(z)
        g_got = jax.grad(lambda v: jnp.sum(
            maxpool_pallas.maxpool_3x3s2_eq(v) ** 2))(z)
        np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref),
                                   rtol=1e-6, atol=1e-6)

    def test_tie_duplication_semantics(self):
        # two maximal positions inside one window: equality routing sends
        # the window's FULL gradient to each (eqroute semantics)
        z = jnp.zeros((1, 1, 4, 4, 1)).at[0, 0, 0, 0, 0].set(5.0)
        z = z.at[0, 0, 0, 1, 0].set(5.0)
        g = jax.grad(lambda v: jnp.sum(
            maxpool_pallas.maxpool_3x3s2_eq(v)))(z)
        # (0,0) in window (0,0) only; (0,1) in windows (0,0) and (0,1)
        assert float(g[0, 0, 0, 0, 0]) == 1.0
        assert float(g[0, 0, 0, 1, 0]) == 2.0
