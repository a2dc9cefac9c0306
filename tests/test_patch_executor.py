"""Patch-bounded executor vs full-frame executor (must be identical)."""

import numpy as np
import jax.numpy as jnp

import libnativecpurenderer_tpu as R
from libnativecpurenderer_tpu.ops import executor


def _scene(ctx, tex, het):
    ctx.set_color(0.1, 0.1, 0.1, 1.0)
    ctx.draw_rect(10, 10, 100, 80, 0.2, 0.5, 0.9, 0.7)
    ctx.save_state()
    ctx.translate(60.0, 70.0)
    ctx.rotate(0.4)
    ctx.scale(1.5, 1.5)   # general (non-fast) texture path
    ctx.draw_texture(tex, -20, -10, 40, 20)
    ctx.draw_splitted_texture(tex, 5, 5, 30, 30, 0.2, 0.8, 0.1, 0.9)
    ctx.restore_state()
    ctx.draw_texture(tex, 100.5, 30.5, 50, 40)  # fast path near edge
    ctx.draw_texture(tex, 170, 120, 60, 60)     # clipped at border
    ctx.draw_texture(het, 20, 90, 40, 40)       # procedural hit effect
    ctx.draw_circle(150, 100, 30, 1, 0.2, 0.2, 0.5)


def test_patch_equals_full():
    W, H = 192, 144
    rng = np.random.default_rng(0)
    arr = rng.random((16, 16, 4))
    tex = R.Texture(16, 16, True, arr.astype(np.float64).tobytes(),
                    is_uint8=False)
    het = R.HitEffectTexture(tex, 0.3, 0.5, 0.9, 0.8, 0.7)

    ctx = R.RenderContext(W, H, True)
    _scene(ctx, tex, het)
    assert ctx._patch_buckets() == (128, 0)  # extents fit the small class
    via_patch = ctx.numpy_buffer()

    ctx2 = R.RenderContext(W, H, True)
    _scene(ctx2, tex, het)
    # force the legacy full-frame path
    ctx2._max_sampling_extent = 1e9
    assert ctx2._patch_buckets() == (0, 0)
    via_full = ctx2.numpy_buffer()

    np.testing.assert_array_equal(via_patch, via_full)


def test_patch_kernel_direct():
    """render_command_list(patch=k) == render_command_list(patch=0)."""
    W, H = 192, 144
    rng = np.random.default_rng(1)
    arr = rng.random((8, 8, 4))
    tex = R.Texture(8, 8, True, arr.astype(np.float64).tobytes(),
                    is_uint8=False)
    ctx = R.RenderContext(W, H, True)
    ctx.set_color(0, 0, 0, 1)
    for i in range(10):
        ctx.save_state()
        ctx.translate(15 + i * 17.3, 20 + (i * 31) % 90)
        ctx.rotate(0.2 * i)
        ctx.draw_texture(tex, -10, -10, 25, 25)
        ctx.restore_state()
    kinds, params = ctx._cmds.snapshot()
    fb0 = jnp.zeros((H, W, 4), jnp.float64)
    kp = jnp.asarray(np.ascontiguousarray(kinds))
    pp = jnp.asarray(np.ascontiguousarray(params))
    atlas = ctx._store.device
    out_full = executor.render_command_list(fb0, kp, pp, atlas, 0)
    out_patch = executor.render_command_list(fb0, kp, pp, atlas, 128)
    np.testing.assert_array_equal(np.asarray(out_patch),
                                  np.asarray(out_full))


def test_two_class_patches():
    """A big hit effect must not change results while small notes use the
    small window class (mixed patch/patch_big routing)."""
    W, H = 320, 280
    rng = np.random.default_rng(3)
    arr = rng.random((16, 16, 4))
    tex = R.Texture(16, 16, True, arr.astype(np.float64).tobytes(),
                    is_uint8=False)
    het = R.HitEffectTexture(tex, 0.4, 0.6, 0.8, 0.7, 0.6)

    def scene(ctx):
        ctx.set_color(0.05, 0.05, 0.05, 1.0)
        for i in range(6):
            ctx.save_state()
            ctx.translate(30 + i * 45.0, 40 + (i * 67) % 180)
            ctx.rotate(0.3 * i)
            ctx.draw_texture(tex, -15, -15, 30, 30)   # small blits
            ctx.restore_state()
        ctx.draw_texture(het, 40, 40, 200, 200)       # big effect -> class 2

    ctx = R.RenderContext(W, H, True)
    scene(ctx)
    assert ctx._patch_buckets() == (128, 256)
    got = ctx.numpy_buffer()

    ctx2 = R.RenderContext(W, H, True)
    scene(ctx2)
    ctx2._max_sampling_extent = 1e9  # legacy full path
    want = ctx2.numpy_buffer()
    np.testing.assert_array_equal(got, want)


def test_unroll_signature_canonicalisation():
    """Run-length padding collapses churning command counts into one
    unrolled-flush signature: frames drawing 13 vs 15 vs 16 rects (same
    kinds) must share a compiled signature (bucket 16), and the padded
    execution must match the loop executor bit-for-bit."""
    from libnativecpurenderer_tpu import config
    from libnativecpurenderer_tpu.context import RenderContext

    W, H = 256, 200
    outs = {}
    sigs = []
    for n in (13, 15, 16):
        RenderContext._unroll_sigs.clear()
        RenderContext._unroll_compiled.clear()
        ctx = R.RenderContext(W, H, True)
        ctx.set_color(0.1, 0.1, 0.1, 1.0)
        for i in range(n):
            ctx.draw_rect(5 + 9 * i, 10 + 5 * i, 20, 15,
                          0.2 + 0.04 * i, 0.5, 0.3, 0.8)
        got = ctx.numpy_buffer()
        assert len(RenderContext._unroll_compiled) == 1
        sigs.append(next(iter(RenderContext._unroll_compiled)))
        # loop-executor reference (unrolled disabled)
        config.set_flush_unrolled(False)
        try:
            ctx2 = R.RenderContext(W, H, True)
            ctx2.set_color(0.1, 0.1, 0.1, 1.0)
            for i in range(n):
                ctx2.draw_rect(5 + 9 * i, 10 + 5 * i, 20, 15,
                               0.2 + 0.04 * i, 0.5, 0.3, 0.8)
            want = ctx2.numpy_buffer()
        finally:
            config.set_flush_unrolled(True)
        np.testing.assert_array_equal(got, want)
        outs[n] = got
    # 13, 15 and 16 rects all pad to the 16-bucket -> one signature
    assert sigs[0] == sigs[1] == sigs[2]


def test_unroll_compile_cap_evicts_lru():
    """Churning MORE distinct signatures than the compile cap must not
    permanently disable the unrolled executor: the compiled-signature
    LRU evicts (disposing patch_exec's jitted entries) and later
    repeats of any signature unroll again (round-3 verdict item 8)."""
    from libnativecpurenderer_tpu import config
    from libnativecpurenderer_tpu.context import RenderContext
    from libnativecpurenderer_tpu.ops import patch_exec

    W, H = 64, 48
    old_cap = config.flush_unroll_compile_cap()
    old_min = config.flush_unroll_min_seen()
    config.set_flush_unroll_compile_cap(3)
    config.set_flush_unroll_min_seen(1)
    RenderContext._unroll_sigs.clear()
    RenderContext._unroll_compiled.clear()
    patch_exec._UNROLL_FN_CACHE.clear()

    def scene(n):
        ctx = R.RenderContext(W, H, True)
        for i in range(n):
            ctx.draw_rect(2.0 + 3 * i, 4.0, 8.0, 6.0,
                          0.1 * (i % 9), 0.5, 0.3, 0.8)
        return ctx.numpy_buffer()

    def idle():
        # age every compiled signature past the thrash-guard window
        # (as a long-lived server moving to the next chart would)
        RenderContext._unroll_tick += RenderContext._UNROLL_EVICT_IDLE + 1

    try:
        # distinct run buckets -> distinct signatures, 4 > cap 3
        counts = (1, 2, 4, 6)
        first = {}
        for n in counts:
            idle()
            first[n] = scene(n)
        assert len(RenderContext._unroll_compiled) == 3
        assert len(patch_exec._UNROLL_FN_CACHE) <= 3
        # the earliest signatures were evicted; repeating one must
        # unroll (and recompile) again rather than miss forever
        h0 = RenderContext._unroll_hits
        idle()
        again = scene(counts[0])
        assert RenderContext._unroll_hits == h0 + 1, \
            "evicted signature no longer unrolls"
        np.testing.assert_array_equal(again, first[counts[0]])
        # thrash guard: a burst of fresh signatures while the compiled
        # set is HOT must not evict (loop-executor fallback instead of
        # an evict-recompile storm) — the compiled set is unchanged
        for n in (4, 6):
            scene(n)      # touch: every compiled signature is now hot
        hot = set(RenderContext._unroll_compiled)
        scene(3)
        scene(3)          # seen twice, wants to compile — victims hot
        assert set(RenderContext._unroll_compiled) == hot, \
            "hot signature evicted (compile thrash)"
    finally:
        config.set_flush_unroll_compile_cap(old_cap)
        config.set_flush_unroll_min_seen(old_min)


def test_unrolled_barriers_off_bit_equal():
    """Dropping the per-command fb optimization barrier must not change
    output: the rounding-sensitive products are individually barriered
    inside the branch bodies (executor._blend_into, mk_region snaps).
    Guarded here so a future branch-body edit that starts relying on
    the inter-command barrier fails loudly (device A/B:
    tools/exp_r3_barriers.py)."""
    from libnativecpurenderer_tpu import config
    from libnativecpurenderer_tpu.ops import patch_exec

    W, H = 320, 240
    rng = np.random.default_rng(7)
    ctx = R.RenderContext(W, H, True)
    texs = [R.Texture._from_array(rng.random((64, 64, 4)), True)
            for _ in range(2)]
    old_min = config.flush_unroll_min_seen()
    old_k = config.canvas_kernel_enabled()
    config.set_flush_unroll_min_seen(1)
    config.set_canvas_kernel(False)
    caps = []
    orig = patch_exec.render_flush_unrolled

    def wrapper(fb, rows, atlas, sig, barriers=True):
        caps.append((np.asarray(rows), np.asarray(atlas), sig))
        return orig(fb, rows, atlas, sig, barriers)

    patch_exec.render_flush_unrolled = wrapper
    try:
        # full-frame arith stack + rotated/split sampling + rects
        ctx.fill_color(0.05, 0.05, 0.08, 0.25)
        ctx.draw_vertical_grd(0, 0, W, H, 0.3, 0, 0, 0.2, 0, 0.1, 0, 0.8)
        ctx.fill_color(0.2, 0.1, 0.0, 0.1)
        ctx.save_state()
        ctx.translate(80.0, 60.0)
        ctx.rotate(0.37)
        ctx.draw_texture(texs[0], -20, -10, 40, 20)
        ctx.restore_state()
        for i in range(6):
            ctx.draw_splitted_texture(texs[i % 2], 10.0 + 30 * i,
                                      20.0 + 11 * i, 50.0, 25.0,
                                      0.1, 0.9, 0.0, 1.0)
            ctx.draw_rect(5.0 + 17 * i, 40.0 + 13 * i, 30.0, 18.0,
                          0.2, 0.8, 0.4, 0.7)
        ctx.flush()
    finally:
        patch_exec.render_flush_unrolled = orig
        config.set_flush_unroll_min_seen(old_min)
        config.set_canvas_kernel(old_k)
    assert caps, "scene did not reach the unrolled executor"
    for rows_np, atlas_np, sig in caps:
        fb0 = jnp.zeros((H, W, 4), jnp.float32)
        a = np.asarray(patch_exec.frame_step_unrolled(
            fb0, jnp.asarray(rows_np), jnp.asarray(atlas_np), sig, True))
        b = np.asarray(patch_exec.frame_step_unrolled(
            fb0, jnp.asarray(rows_np), jnp.asarray(atlas_np), sig, False))
        assert a.any()
        np.testing.assert_array_equal(a, b)


def test_unrolled_grouped_bit_equal():
    """config.canvas_group_g: batching the fb-independent compute of G
    same-sel patch commands (one vmapped mask/rgba/atlas-region stage,
    sequential ds->blend->dus chain) must be BIT-equal to the
    per-command unrolled path — overlapping patches, bucket pad rows and
    region/MXU sampling routes included (device A/B:
    tools/exp_r5_group.py)."""
    from libnativecpurenderer_tpu import config
    from libnativecpurenderer_tpu.ops import patch_exec

    W, H = 320, 240
    rng = np.random.default_rng(23)
    ctx = R.RenderContext(W, H, True)
    texs = [R.Texture._from_array(rng.random((64, 64, 4)), True)
            for _ in range(2)]
    old_min = config.flush_unroll_min_seen()
    old_k = config.canvas_kernel_enabled()
    config.set_flush_unroll_min_seen(1)
    config.set_canvas_kernel(False)
    caps = []
    orig = patch_exec.render_flush_unrolled

    def wrapper(fb, rows, atlas, sig, barriers=True):
        caps.append((np.asarray(rows), np.asarray(atlas), sig))
        return orig(fb, rows, atlas, sig, barriers)

    patch_exec.render_flush_unrolled = wrapper
    try:
        ctx.fill_color(0.05, 0.05, 0.08, 0.25)
        # run of 7 OVERLAPPING split blits (bucket 8 -> one pad row;
        # groups of 3 split them 3+3+2 with overlaps INSIDE groups)
        for i in range(7):
            ctx.draw_splitted_texture(texs[i % 2], 40.0 + 9 * i,
                                      30.0 + 5 * i, 60.0, 30.0,
                                      0.1, 0.9, 0.0, 1.0)
        # rotated texture -> region-gather route, then an axis-aligned
        # run (MXU one-hot route)
        ctx.save_state()
        ctx.translate(160.0, 120.0)
        ctx.rotate(0.45)
        ctx.draw_texture(texs[0], -25, -12, 50, 24)
        ctx.draw_texture(texs[1], -10, -30, 40, 40)
        ctx.restore_state()
        for i in range(5):
            ctx.draw_texture(texs[i % 2], 12.0 + 31 * i, 150.0 + 7 * i,
                             44.0, 22.0)
        # base-kind patch runs (rects overlap each other)
        for i in range(6):
            ctx.draw_rect(100.0 + 11 * i, 90.0 + 6 * i, 50.0, 30.0,
                          0.2, 0.8, 0.4, 0.6)
        for i in range(3):
            ctx.draw_line(20.0 + 40 * i, 200.0, 90.0 + 40 * i, 228.0,
                          5.0, 0.9, 0.9, 1.0, 0.8)
        ctx.flush()
    finally:
        patch_exec.render_flush_unrolled = orig
        config.set_flush_unroll_min_seen(old_min)
        config.set_canvas_kernel(old_k)
    assert caps, "scene did not reach the unrolled executor"
    assert any(any(s[0] == "patch" and any(c > 1 for _, c in s[3])
                   for s in sig) for _, _, sig in caps), \
        "no multi-command patch run captured"
    old_g = config.canvas_group_g()
    try:
        for rows_np, atlas_np, sig in caps:
            fb0 = jnp.zeros((H, W, 4), jnp.float32)
            config.set_canvas_group_g(0)
            base = np.asarray(patch_exec.frame_step_unrolled(
                fb0, jnp.asarray(rows_np), jnp.asarray(atlas_np), sig))
            assert base.any()
            for g in (3, 8):
                config.set_canvas_group_g(g)
                got = np.asarray(patch_exec.frame_step_unrolled(
                    fb0, jnp.asarray(rows_np), jnp.asarray(atlas_np),
                    sig))
                np.testing.assert_array_equal(got, base, err_msg=f"g={g}")
    finally:
        config.set_canvas_group_g(old_g)
