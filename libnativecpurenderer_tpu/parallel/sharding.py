"""Multi-device scale-out: mesh construction + sharded render/mix steps.

The reference is strictly single-threaded, single-process (SURVEY.md §2.3);
there is no communication semantics to preserve, so this module makes the
TPU-native choices:

  * **data axis**: independent frames of a batch (embarrassingly parallel —
    the per-frame Python loop of milrenderer:865 becomes a sharded batch);
  * **tile axis**: horizontal bands of the framebuffer within one frame
    (the per-pixel loops become per-band rasterization);
  * collectives: ``all_gather`` over the tile axis reassembles full frames
    only at the presentation boundary (the device->host handoff that feeds
    the encoder, the analogue of cpp:232-275); ``psum`` mixes partial audio
    overlays across devices.

All shardings ride a 2D ``jax.sharding.Mesh`` (('data', 'tile')) via
``shard_map``, so ICI carries the collectives and XLA overlaps them with
compute.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import raster3d



def make_mesh(devices=None, data: int = None, tile: int = None) -> Mesh:
    """Factor the device list into a (data, tile) mesh.  Default: put up to
    2 ways on tile (bands are latency-bound), the rest on data."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data is None or tile is None:
        tile = 2 if n % 2 == 0 and n >= 2 else 1
        data = n // tile
    assert data * tile == n, f"{data}x{tile} != {n}"
    arr = np.asarray(devices).reshape(data, tile)
    return Mesh(arr, ("data", "tile"))


def sharded_render_step(mesh: Mesh, width: int, height: int,
                        faces, vtx_colors):
    """Build a jitted sharded step: (angles (B,), verts (V,3)) ->
    (frames (B, H, W, 4), mixed_audio (N, C)).

    Frames are sharded over 'data', each frame's rows over 'tile'; the
    returned frames are reassembled with an all_gather over 'tile'.  A toy
    audio mixdown rides along to exercise psum (each device contributes a
    partial overlay of its frame batch's hit sounds).
    """
    tile_n = mesh.shape["tile"]
    data_n = mesh.shape["data"]
    assert height % tile_n == 0
    band_h = height // tile_n

    faces = jnp.asarray(faces, jnp.int32)
    vtx_colors = jnp.asarray(vtx_colors, jnp.float32)

    def rot_y(angle):
        c = jnp.cos(angle)
        s = jnp.sin(angle)
        z = jnp.zeros_like(angle)
        o = jnp.ones_like(angle)
        return jnp.stack([
            jnp.stack([c, z, s, z]),
            jnp.stack([z, o, z, z]),
            jnp.stack([-s, z, c, z]),
            jnp.stack([z, z, z, o]),
        ])

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P("data"), P(None, None), P(None, None), P("data")),
        out_specs=(P("data", "tile"), P(), P("data")),
    )
    def step(angles_local, verts, proj_view, audio_events_local):
        # NOTE: the canvas (2D display-list) analogue of this sharded step
        # is sharded_canvas_step below.
        t_idx = jax.lax.axis_index("tile")
        y0 = (t_idx * band_h).astype(jnp.float32)

        def one_frame(angle):
            mvp = proj_view @ rot_y(angle)
            fb, _ = raster3d.render_gouraud(
                verts, faces, vtx_colors, width, band_h, mvp,
                band_height=band_h, full_height=height, y0=y0)
            return fb

        bands = jax.vmap(one_frame)(angles_local)        # (Bl, band_h, W, 4)
        # full frames are reassembled by the output sharding (axis 1 over
        # 'tile'); the explicit tile-axis collective below exercises ICI
        # with a real cross-band reduction (per-frame mean luminance, as a
        # tone-mapping pass would need)
        lum = jnp.mean(bands[..., :3], axis=(1, 2, 3))   # (Bl,)
        lum = jax.lax.psum(lum, "tile") / tile_n

        # audio: each data shard scatters its events into a local mix,
        # psum over the mesh yields the global mixdown (additive overlay
        # semantics of cpp:1129-1154)
        n_samples = 1024
        sfx = jnp.sin(jnp.arange(64, dtype=jnp.float32) * 0.3)[:, None]
        sfx = jnp.broadcast_to(sfx, (64, 2))
        local = jnp.zeros((n_samples, 2), jnp.float32)
        starts = (audio_events_local * n_samples).astype(jnp.int32)
        idx = starts[:, None] + jnp.arange(64)[None, :]
        src = jnp.broadcast_to(sfx[None], (starts.shape[0], 64, 2))
        local = local.at[idx.reshape(-1)].add(
            src.reshape(-1, 2), mode="drop")
        # events are sharded over 'data' (replicated across 'tile'), so the
        # reduction rides the data axis only
        mixed = jax.lax.psum(local, "data")
        return bands, mixed, lum

    return step, (data_n, tile_n, band_h)


def sharded_raster3d_step(mesh: Mesh, width: int, height: int, faces,
                          vtx_colors=None, uvs=None, tex=None,
                          tile_w: int = 32, tile_h: int = 32,
                          capacity: int = 128, span_x: int = 8,
                          span_y: int = 8, pallas: bool = False,
                          pallas_kw: dict | None = None,
                          with_ovf: bool = False):
    """Frame-batch data-parallel step of the PRODUCTION binned 3D
    rasterizer over the whole mesh: B frames' MVPs shard across every
    device (both axes flattened — video rendering is embarrassingly
    frame-parallel, so DP over the full mesh is the scaling layout),
    each device scans its local frames through render_gouraud_binned
    (or render_textured_binned when ``uvs``/``tex`` are given), and the
    output sharding reassembles (B, H, W, 4) frames.  Geometry/colors/
    texture are replicated — they are per-scene constants.

    Bit-exact vs the single-device rasterizer by construction (each
    frame runs the identical program on one device); asserted on the
    virtual mesh by __graft_entry__.dryrun_multichip and
    tests/test_sharding.py.

    ``pallas=True`` routes each device's frames through the CHAMPION
    fused Pallas kernel path (render_gouraud_pallas u8 video mode with
    the pregather hoist; override config via ``pallas_kw``) instead of
    the XLA binned path — frames come back uint8.  On CPU meshes (the
    virtual-device dryrun) the kernel runs interpreted.

    Returns a shard_map'd fn (mvps (B, 4, 4), verts (V, 3)) ->
    frames (B, H, W, 4).  B must divide by the device count.
    ``with_ovf=True`` returns (frames, ovf (B,) bool) instead — the
    per-frame bin/span overflow flags, so production consumers
    (pipeline.ShardedMeshVideoPipeline) can refuse clamped frames
    instead of shipping them.
    """
    textured = uvs is not None
    assert textured == (tex is not None), "uvs and tex come together"
    assert not (pallas and textured), "pallas mode is the Gouraud path"
    faces = jnp.asarray(faces, jnp.int32)
    if textured:
        uvs = jnp.asarray(uvs, jnp.float32)
        tex = jnp.asarray(tex)
    else:
        vtx_colors = jnp.asarray(vtx_colors, jnp.float32)
    axes = ("data", "tile")
    pkw = dict(tile_w=tile_w, tile_h=tile_h, capacity=capacity,
               span_x=span_x, span_y=span_y, flat=True, u8=True,
               kcc=16, interpret=jax.default_backend() == "cpu")
    if pallas_kw:
        pkw.update(pallas_kw)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(axes), P(None, None)),
        out_specs=(P(axes), P(axes)) if with_ovf else P(axes),
        # pallas_call's out ShapeDtypeStruct carries no vma annotation,
        # which check_vma=True rejects inside shard_map; frame-DP runs
        # the identical per-device program on purely-local data, so the
        # varying-axes check adds nothing here
        check_vma=not pallas,
    )
    def step(mvps_local, verts):
        pre = ((raster3d.pregather_mesh(verts, faces),
                vtx_colors[faces]) if pallas else None)

        def one(mvp):
            if pallas:
                fb, _, ovf = raster3d.render_gouraud_pallas.__wrapped__(
                    verts, faces, vtx_colors, width, height, mvp,
                    pre=pre, **pkw)
            elif textured:
                fb, _, ovf = raster3d.render_textured_binned(
                    verts, faces, uvs, tex, width, height, mvp,
                    tile_w=tile_w, tile_h=tile_h, capacity=capacity,
                    span_x=span_x, span_y=span_y)
            else:
                fb, _, ovf = raster3d.render_gouraud_binned(
                    verts, faces, vtx_colors, width, height, mvp,
                    tile_w=tile_w, tile_h=tile_h, capacity=capacity,
                    span_x=span_x, span_y=span_y)
            return fb, ovf

        def body(carry, mvp):
            return carry, one(mvp)

        _, (frames, ovfs) = jax.lax.scan(body, jnp.zeros((), jnp.int32),
                                         mvps_local)
        if with_ovf:
            return frames, ovfs
        return frames

    return step


def sharded_audio_mixdown(mesh: Mesh, target_len: int, channels: int,
                          dtype=jnp.float32):
    """Sharded batched overlay: hit/drag events split across the whole
    device mesh, each device scatter-adds its shard with the production
    overlay kernel (ops/audio_ops.overlay_many — the op milrenderer's
    mix_bgm dispatches), and one psum over both axes yields the global
    mix.  Matches single-device overlay_many exactly (addition is the
    only cross-event interaction, cpp:1145-1151).

    Returns a shard_map'd fn (target (N, C) replicated, source (n, C)
    replicated, starts (E,) i32 sharded) -> mixed (N, C) replicated.
    ``E`` must divide by the device count; pad extra slots with
    ``start >= N`` (dropped, the reference's truncate semantics)."""
    from ..ops import audio_ops

    axes = ("data", "tile")

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(None, None), P(None, None), P(axes)),
        out_specs=P(None, None),
    )
    def step(target, source, starts_local):
        local = jnp.zeros((target_len, channels), dtype)
        local = audio_ops.overlay_many(local, source, starts_local)
        return target + jax.lax.psum(local, axes)

    return step


def sharded_canvas_step(mesh: Mesh, width: int, height: int,
                        with_fb0: bool = False):
    """Sharded 2D display-list rendering: the command list is replicated,
    each device renders its y-band of each frame in its frame shard (the
    reference's per-pixel loops become per-band executor dispatches;
    SURVEY §2.3's framebuffer y-tile split).

    Returns a shard_map'd fn (kinds (B, N), params (B, N, PW), atlas[,
    fb0 (H, W, 4)]) -> u8 frames (B, H, W, 4) assembled by the output
    sharding.  ``with_fb0`` adds a shared initial framebuffer argument,
    sharded into y-bands over 'tile' (milrenderer's pre-composited
    static layers); without it every frame starts from zeros.

    The per-device frame batch runs under ``lax.scan`` (frames on one
    device are sequential either way), so trace/compile time is FLAT in
    ``B / mesh.shape['data']`` — production batch sizes compile in the
    same time as the dryrun's tiny ones.  vmap is still off the table:
    its cond/switch batching rule replays the executor's embedded pvary
    unification with stale axes (verified 2026-08-19); scan is vma-aware
    and needs no such machinery.
    """
    from ..ops import executor

    tile_n = mesh.shape["tile"]
    assert height % tile_n == 0
    band_h = height // tile_n

    axes = ("data", "tile")
    in_specs = [P("data"), P("data"), P(None, None, None)]
    if with_fb0:
        in_specs.append(P("tile", None, None))

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=P("data", "tile"),
        # VMA checking stays ON: the executor's switch branches mix
        # invariant constants, band-varying Y terms and shard-varying
        # params, so render_command_list zero-taints every branch output
        # to a uniform varying type (executor._build_branches vma_taint)
        check_vma=True,
    )
    def step(kinds_local, params_local, atlas, *maybe_fb0):
        t_idx = jax.lax.axis_index("tile")
        y0 = (t_idx * band_h).astype(params_local.dtype)
        if maybe_fb0:
            # sharded over 'tile' already (each device holds its band);
            # make it data-varying too so the executor's taint alignment
            # sees one uniform varying type
            fb0 = jax.lax.pcast(maybe_fb0[0], "data", to="varying")
        else:
            fb0 = jax.lax.pcast(
                jnp.zeros((band_h, width, 4), params_local.dtype),
                axes, to="varying")

        def one(kinds, params):
            fb = executor.render_command_list(fb0, kinds, params, atlas,
                                              y0=y0, vma_axes=axes)
            return (fb * 255.0).astype(jnp.int32).astype(jnp.uint8)

        def body(carry, xs):
            kinds, params = xs
            return carry, one(kinds, params)

        _, frames = jax.lax.scan(body, jnp.zeros((), jnp.int32),
                                 (kinds_local, params_local))
        return frames  # (Bl, band, W, 4)

    return step, band_h
