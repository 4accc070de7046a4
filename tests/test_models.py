"""Model shape/dtype/behavior tests (SURVEY.md section 4.2 unit tier)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pwstablenet_tpu.config import ModelConfig
from pwstablenet_tpu.models import (
    CascadedGenerator,
    FeatureExtractor,
    PatchDiscriminator,
    StageUNet,
)

# Small config: 64x64 model resolution, 6 levels, thin features.
SMALL = ModelConfig(
    temporal_window=3,
    num_levels=6,
    base_features=8,
    max_features=32,
    model_resolution=(64, 64),
    num_stages=2,
    compute_dtype="float32",
)


def _stack(cfg, b=2, seed=0):
    rng = np.random.default_rng(seed)
    h, w = cfg.model_resolution
    return jnp.asarray(
        rng.standard_normal((b, h, w, cfg.stack_channels)).astype(np.float32)
    )


def test_stage_unet_shapes():
    x = _stack(SMALL)
    model = StageUNet(SMALL)
    params = model.init(jax.random.PRNGKey(0), x)
    flow, feats = model.apply(params, x)
    assert flow.shape == (2, 64, 64, 2)
    assert flow.dtype == jnp.float32
    assert len(feats) == SMALL.num_levels
    # decoder pyramid coarse -> fine: last is full res
    assert feats[-1].shape[1:3] == (64, 64)
    assert feats[0].shape[1:3] == (2, 2)


def test_stage_unet_zero_init_head():
    """Freshly initialized stage produces the identity warp."""
    x = _stack(SMALL)
    model = StageUNet(SMALL)
    params = model.init(jax.random.PRNGKey(0), x)
    flow, _ = model.apply(params, x)
    np.testing.assert_allclose(np.asarray(flow), 0.0, atol=1e-6)


@pytest.mark.parametrize("interstage", ["features", "warped", "both"])
def test_cascade_shapes_and_wiring(interstage):
    import dataclasses

    cfg = dataclasses.replace(SMALL, interstage=interstage)
    x = _stack(cfg)
    model = CascadedGenerator(cfg)
    params = model.init(jax.random.PRNGKey(0), x)
    flows = model.apply(params, x)
    assert len(flows) == cfg.num_stages
    for f in flows:
        assert f.shape == (2, 64, 64, 2)
        assert np.isfinite(np.asarray(f)).all()


def test_cascade_residual_refinement():
    """Stage-2 flow equals stage-1 flow at init (zero-init residual)."""
    x = _stack(SMALL)
    model = CascadedGenerator(SMALL)
    params = model.init(jax.random.PRNGKey(0), x)
    flows = model.apply(params, x)
    np.testing.assert_allclose(
        np.asarray(flows[1]), np.asarray(flows[0]), atol=1e-6
    )


def test_discriminator_patch_output():
    cfg = SMALL
    rng = np.random.default_rng(1)
    # conditional input: unstable center + candidate stable frame
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 6)).astype(np.float32))
    model = PatchDiscriminator(cfg)
    params = model.init(jax.random.PRNGKey(0), x)
    score = model.apply(params, x)
    assert score.shape[0] == 2 and score.shape[-1] == 1
    # patch map, not a scalar: spatial dims survive
    assert score.shape[1] > 1 and score.shape[2] > 1


def test_feature_extractor_pyramid():
    cfg = SMALL
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)).astype(np.float32))
    model = FeatureExtractor(cfg)
    params = model.init(jax.random.PRNGKey(0), x)
    feats = model.apply(params, x)
    assert len(feats) == len(cfg.feat_channels)
    assert feats[0].shape == (2, 64, 64, cfg.feat_channels[0])
    assert feats[1].shape == (2, 32, 32, cfg.feat_channels[1])


def test_generator_is_jittable_and_differentiable():
    x = _stack(SMALL)
    model = CascadedGenerator(SMALL)
    params = model.init(jax.random.PRNGKey(0), x)

    @jax.jit
    def loss_fn(p, x):
        flows = model.apply(p, x)
        return sum(jnp.mean(f**2) for f in flows)

    g = jax.grad(loss_fn)(params, x)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)


@pytest.mark.parametrize("norm", ["batch", "group", "none"])
def test_norm_variants_forward_and_grad(norm):
    import dataclasses

    cfg = dataclasses.replace(SMALL, norm=norm)
    x = _stack(cfg)
    model = CascadedGenerator(cfg)
    params = model.init(jax.random.PRNGKey(0), x)

    @jax.jit
    def loss(p, x):
        return sum(jnp.mean(f**2) for f in model.apply(p, x))

    g = jax.grad(loss)(params, x)
    assert all(
        np.isfinite(np.asarray(l)).all()
        for l in jax.tree_util.tree_leaves(g)
    )


def test_config_validation():
    import dataclasses

    with pytest.raises(ValueError, match="odd"):
        ModelConfig(temporal_window=4)
    with pytest.raises(ValueError, match="divisible"):
        ModelConfig(model_resolution=(100, 100))
    # PatchGAN too deep for the input -> empty score map -> NaN loss;
    # must fail loudly at trace time, not poison training silently
    cfg16 = ModelConfig(model_resolution=(16, 16), num_levels=3)
    from pwstablenet_tpu.models.discriminator import PatchDiscriminator

    disc = PatchDiscriminator(cfg16)
    with pytest.raises(ValueError, match="disc_num_layers"):
        disc.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 6)))
    # the same input with a shallow disc is fine (dryrun config)
    shallow = PatchDiscriminator(
        dataclasses.replace(cfg16, disc_num_layers=1)
    )
    shallow.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 6)))


def test_phase_conv_decoder_matches_deconv():
    """decoder_impl=phase_conv is the SAME operator as the flax
    ConvTranspose lowering: identical param tree, float-tolerance-
    identical generator outputs and gradients (the phase form exists
    to bypass the input-dilation lowering's kernel-layout copies —
    scratch/r7_deconv_probe.py has the tap-mapping derivation)."""
    import dataclasses

    cfg_d = SMALL
    cfg_p = dataclasses.replace(SMALL, decoder_impl="phase_conv")
    x = _stack(cfg_d)
    gen_d = CascadedGenerator(cfg_d)
    gen_p = CascadedGenerator(cfg_p)
    params = gen_d.init(jax.random.PRNGKey(3), x)

    # identical param trees: the phase module reuses kernel/bias as-is
    tree_p = jax.tree_util.tree_structure(
        gen_p.init(jax.random.PRNGKey(3), x)
    )
    assert jax.tree_util.tree_structure(params) == tree_p

    # zero-init heads make a fresh init's flows all-zero in BOTH impls;
    # randomize params so the comparison exercises real activations
    leaves, treedef = jax.tree_util.tree_flatten(params)
    rng = np.random.default_rng(0)
    leaves = [
        jnp.asarray(rng.standard_normal(l.shape).astype(np.float32)) * 0.05
        for l in leaves
    ]
    params = jax.tree_util.tree_unflatten(treedef, leaves)

    flows_d, warped_d = gen_d.apply(params, x)
    flows_p, warped_p = gen_p.apply(params, x)
    np.testing.assert_allclose(
        np.asarray(flows_d[-1]), np.asarray(flows_p[-1]),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(warped_d), np.asarray(warped_p), rtol=1e-4, atol=1e-5
    )

    # gradient parity (plain-conv grads vs dilated-conv grads)
    def loss(p, gen):
        flows, warped = gen.apply(p, x)
        return jnp.mean(warped.astype(jnp.float32) ** 2) + jnp.mean(
            flows[-1] ** 2
        )

    g_d = jax.grad(lambda p: loss(p, gen_d))(params)
    g_p = jax.grad(lambda p: loss(p, gen_p))(params)
    for a, b in zip(
        jax.tree_util.tree_leaves(g_d), jax.tree_util.tree_leaves(g_p)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5
        )


def test_decoder_impl_unknown_raises():
    with pytest.raises(ValueError, match="decoder_impl"):
        ModelConfig(decoder_impl="nope")
