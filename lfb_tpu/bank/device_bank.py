"""HBM-resident long-term feature bank with on-device window gather.

The reference ships each example's bank window through the input pipeline as
a (W*K, 2048) host-assembled blob (``lib/datasets/ava.py:300-323``) -- for
an AVA batch of 16 clips x 4 boxes that is ~150 MB of host->device traffic
per step.  TPU-natively the whole bank lives in HBM once (1-4 GB,
``GETTING_STARTED.md:45``) and each step gathers windows on device from
tiny (video_idx, center) index pairs.

Two bank layouts:

  * :class:`AvaDeviceBank` -- per-(video, second) feature lists; window
    sampling keeps <=K random features per second (zero-padded), matching
    host ``sample_lfb_window`` semantics.
  * :class:`FrameDeviceBank` -- per-video frame-indexed features
    (Charades / EPIC-verb / EPIC-noun); window sampling takes the first W
    features whose frame id falls in the window, exactly like the host
    samplers (``charades.py:251-276``, ``epic.py:310-331``).  Noun banks
    store several detector features per frame (``epic.py:338-374``);
    :meth:`FrameDeviceBank.build_noun` flattens them into repeated frame
    ids (per-frame truncated to MAX_NUM_FEATS_PER_NOUN_LFB_FRAME, the same
    cap the host sampler applies), which makes the reference's
    early-exit fill the identical first-W-in-order gather.

Gathers are pure jittable functions of int32 index arrays, so they run
inside the train/eval step on the accelerator.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

AVA_SEC_BASE = 902
AVA_NUM_SECS = 897  # seconds 902..1798


class AvaDeviceBank:
    """Packed AVA bank: flat features + (video, sec, slot) index table."""

    def __init__(self, feats: jax.Array, table: jax.Array, counts: jax.Array,
                 *, window_size: int, k: int):
        self.feats = feats          # (R+1, D); row R is the zero row
        self.zero_idx = feats.shape[0] - 1
        self.table = table          # (V, AVA_NUM_SECS, K_store) row ids
        self.counts = counts        # (V, AVA_NUM_SECS) valid slots
        self.window_size = window_size
        self.k = k

    def num_videos(self) -> int:
        return self.table.shape[0]

    @classmethod
    def build(cls, host_bank: Dict[int, Dict[int, list]], *, window_size: int,
              k: int, lfb_dim: int = 2048, k_store: int = 0,
              dtype=jnp.float32) -> 'AvaDeviceBank':
        """``k_store`` caps the per-(video, sec) index-table width.  The
        default 0 auto-sizes it to the largest feature count in the bank, so
        every feature is stored and :meth:`gather` samples from the full set
        -- exactly the host/reference semantics (``ava.py:300-323``).  An
        explicit positive cap bounds table memory; entries over the cap are
        uniformly subsampled at build time (seeded), which keeps each draw's
        marginal distribution uniform over all features but fixes the
        retained subset for the bank's lifetime."""
        num_videos = max(host_bank.keys()) + 1 if host_bank else 0
        if k_store <= 0:
            k_store = max([k] + [len(f) for secs in host_bank.values()
                                 for f in secs.values()])
            # The auto width is set by the single largest (video, sec)
            # entry, so one crowded keyframe inflates the whole
            # num_videos x 3600 x k_store int32 table: make the choice and
            # its cost visible (TPU.BANK_K_STORE > 0 is the explicit cap).
            import logging
            logging.getLogger(__name__).info(
                'AvaDeviceBank: auto k_store=%d (largest per-(video, sec) '
                'feature count); index table %d x %d x %d int32 = %.1f MiB',
                k_store, num_videos, AVA_NUM_SECS, k_store,
                num_videos * AVA_NUM_SECS * k_store * 4 / 2 ** 20)
        rows = []
        table = np.full((num_videos, AVA_NUM_SECS, k_store), -1, np.int32)
        counts = np.zeros((num_videos, AVA_NUM_SECS), np.int32)
        truncated = 0
        sub_rng = np.random.default_rng(20190607)  # fixed: reproducible banks
        for video, secs in host_bank.items():
            for sec, feats in secs.items():
                si = sec - AVA_SEC_BASE
                if not 0 <= si < AVA_NUM_SECS:
                    continue
                if len(feats) > k_store:
                    truncated += 1
                    keep = sub_rng.choice(len(feats), k_store, replace=False)
                    feats = [feats[i] for i in sorted(keep)]
                n = len(feats)
                counts[video, si] = n
                for j in range(n):
                    table[video, si, j] = len(rows)
                    rows.append(np.asarray(feats[j], np.float32))
        if truncated:
            import logging
            logging.getLogger(__name__).warning(
                'AvaDeviceBank: %d (video, sec) entries exceeded explicit '
                'k_store=%d and were uniformly subsampled at build time '
                '(set TPU.BANK_K_STORE: 0 to store all features)',
                truncated, k_store)
        zero_row = np.zeros((lfb_dim,), np.float32)
        flat = np.stack(rows + [zero_row]) if rows else zero_row[None]
        zero_idx = flat.shape[0] - 1
        table = np.where(table < 0, zero_idx, table)
        return cls(jnp.asarray(flat, dtype), jnp.asarray(table),
                   jnp.asarray(counts), window_size=window_size, k=k)

    def choose_rows(self, video_idx: jax.Array, sec: jax.Array,
                    rng: jax.Array) -> jax.Array:
        """(N,) video ids + (N,) keyframe seconds -> (N, W*K) feature-row
        ids (invalid slots point at the zero row).

        Per second, min(count, K) features are chosen uniformly without
        replacement into the leading slots; remaining slots are zero
        (matching host ``sample_lfb_window``).
        """
        W, K = self.window_size, self.k
        k_store = self.table.shape[-1]
        N = video_idx.shape[0]

        lower = sec.astype(jnp.int32) - W // 2 - AVA_SEC_BASE     # (N,)
        sec_idx = lower[:, None] + jnp.arange(W, dtype=jnp.int32)  # (N, W)
        in_range = (sec_idx >= 0) & (sec_idx < AVA_NUM_SECS)
        sec_clamped = jnp.clip(sec_idx, 0, AVA_NUM_SECS - 1)

        vid = video_idx.astype(jnp.int32)[:, None]
        counts = jnp.where(in_range, self.counts[vid, sec_clamped], 0)  # (N,W)
        slots = self.table[vid, sec_clamped]                        # (N,W,Ks)

        # Random distinct slots: sort uniforms, invalid slots pushed last.
        u = jax.random.uniform(rng, (N, W, k_store))
        u = u + (jnp.arange(k_store) >= counts[..., None]) * 10.0
        order = jnp.argsort(u, axis=-1)[..., :K]                    # (N,W,K)
        chosen = jnp.take_along_axis(slots, order, axis=-1)
        valid = jnp.arange(K) < jnp.minimum(counts, K)[..., None]   # (N,W,K)

        chosen = jnp.where(valid, chosen, self.zero_idx)
        return chosen.reshape(N, W * K)

    def gather(self, video_idx: jax.Array, sec: jax.Array,
               rng: jax.Array) -> jax.Array:
        """(N,) video ids + (N,) keyframe seconds -> (N, W*K, D) windows."""
        return self.feats[self.choose_rows(video_idx, sec, rng)]

    def bind_feats(self, feats: jax.Array) -> '_BoundFeatsBank':
        """Gather view over ``feats`` passed as a traced step operand (see
        :class:`_BoundFeatsBank`)."""
        return _BoundFeatsBank(self, feats)


def _cap_frame_table_width(label: str, auto_width: int, cap: int,
                           window_size: int, num_videos: int) -> int:
    """Resolve a frame bank's per-video index-table width and make the
    choice visible: the auto width is set by the single LONGEST video, so
    one outlier inflates the (V, M) int32 tables for every video."""
    import logging
    log = logging.getLogger(__name__)
    if cap > 0:
        width = max(cap, window_size)
        log.info('%s: explicit per-video cap %d (index tables 2 x %d x %d '
                 'int32 = %.1f MiB)', label, width, num_videos, width,
                 2 * num_videos * width * 4 / 2 ** 20)
        return width
    log.info('%s: auto per-video width %d (longest video); index tables '
             '2 x %d x %d int32 = %.1f MiB (TPU.BANK_MAX_PER_VIDEO > 0 is '
             'the explicit cap)', label, auto_width, num_videos, auto_width,
             2 * num_videos * auto_width * 4 / 2 ** 20)
    return auto_width


def _warn_frame_truncation(label: str, truncated: int, width: int) -> None:
    if truncated:
        import logging
        logging.getLogger(__name__).warning(
            '%s: %d videos exceeded explicit per-video cap %d and were '
            'uniformly subsampled at build time (set TPU.BANK_MAX_PER_VIDEO: '
            '0 to store all features)', label, truncated, width)


class FrameDeviceBank:
    """Packed frame-level bank: flat features + per-video sorted frame ids.

    ``window_mode`` + fps/clips_per_second define how a clip center maps to
    a [begin, end] frame window ('charades' or 'epic_verb').
    """

    def __init__(self, feats: jax.Array, frame_ids: jax.Array,
                 rows: jax.Array, *, window_size: int,
                 window_mode: str = 'charades', fps: int = 24,
                 clips_per_second: int = 2, max_per_frame: int = 1,
                 frames_per_second: int = 1):
        self.feats = feats          # (R+1, D); last row zero
        self.zero_idx = feats.shape[0] - 1
        self.frame_ids = frame_ids  # (V, M) sorted, -1 padded
        self.rows = rows            # (V, M) row ids (zero row where padded)
        self.window_size = window_size
        self.window_mode = window_mode
        self.fps = fps
        self.clips_per_second = clips_per_second
        self.max_per_frame = max_per_frame
        self.frames_per_second = frames_per_second

    def num_videos(self) -> int:
        return self.frame_ids.shape[0]

    def window(self, center: jax.Array) -> Tuple[jax.Array, jax.Array]:
        if self.window_mode == 'charades':
            return charades_window(center, window_size=self.window_size,
                                   clips_per_second=self.clips_per_second,
                                   fps=self.fps)
        if self.window_mode == 'epic_noun':
            return epic_noun_window(
                center, window_size=self.window_size,
                max_per_frame=self.max_per_frame,
                frames_per_second=self.frames_per_second, fps=self.fps)
        assert self.window_mode == 'epic_verb', self.window_mode
        return epic_verb_window(center, window_size=self.window_size,
                                fps=self.fps)

    def gather_centers(self, video_idx: jax.Array,
                       center: jax.Array) -> jax.Array:
        begin, end = self.window(center)
        return self.gather(video_idx, begin, end)

    @classmethod
    def build(cls, host_bank: Dict, video_key_to_idx=None, *,
              window_size: int, lfb_dim: int = 2048,
              window_mode: str = 'charades', fps: int = 24,
              clips_per_second: int = 2, max_per_video: int = 0,
              dtype=jnp.float32) -> 'FrameDeviceBank':
        """``host_bank`` is {video_key: {frame: feat}}; ``video_key_to_idx``
        maps keys to dense indices (identity for int keys).

        ``max_per_video`` caps the per-video index-table width (the default
        0 auto-sizes to the single LONGEST video, so every feature is
        stored -- exact host semantics); an explicit positive cap bounds
        table memory, with over-length videos uniformly subsampled once at
        build time (``TPU.BANK_MAX_PER_VIDEO``)."""
        if video_key_to_idx is None:
            video_key_to_idx = {k: int(k) for k in host_bank}
        num_videos = max(video_key_to_idx.values()) + 1 if host_bank else 0
        # At least window_size columns so a gather can always yield W rows.
        max_entries = max(max((len(v) for v in host_bank.values()), default=1),
                          window_size)
        max_entries = _cap_frame_table_width(
            'FrameDeviceBank', max_entries, max_per_video, window_size,
            num_videos)
        frame_ids = np.full((num_videos, max_entries), -1, np.int32)
        rows_tab = np.zeros((num_videos, max_entries), np.int32)
        rows = []
        truncated = 0
        sub_rng = np.random.default_rng(20190607)  # fixed: reproducible banks
        for key, frames in host_bank.items():
            vi = video_key_to_idx[key]
            ordered = sorted(frames)
            if len(ordered) > max_entries:
                truncated += 1
                keep = sub_rng.choice(len(ordered), max_entries, replace=False)
                ordered = [ordered[i] for i in sorted(keep)]
            for j, frame in enumerate(ordered):
                frame_ids[vi, j] = frame
                rows_tab[vi, j] = len(rows)
                rows.append(np.asarray(frames[frame], np.float32))
        _warn_frame_truncation('FrameDeviceBank', truncated, max_entries)
        zero_row = np.zeros((lfb_dim,), np.float32)
        flat = np.stack(rows + [zero_row]) if rows else zero_row[None]
        zero_idx = flat.shape[0] - 1
        rows_tab = np.where(frame_ids < 0, zero_idx, rows_tab)
        return cls(jnp.asarray(flat, dtype), jnp.asarray(frame_ids),
                   jnp.asarray(rows_tab), window_size=window_size,
                   window_mode=window_mode, fps=fps,
                   clips_per_second=clips_per_second)

    @classmethod
    def build_noun(cls, host_bank: Dict, *, window_size: int,
                   max_per_frame: int, frames_per_second: int, fps: int,
                   lfb_dim: int = 2048, max_per_video: int = 0,
                   dtype=jnp.float32) -> 'FrameDeviceBank':
        """Noun banks: ``{video_idx: {frame: (n, D) detector feats}}``.

        Flattens each frame's features (first ``max_per_frame``, the cap the
        host sampler applies per frame, reference ``epic.py:352-356``) into
        consecutive entries sharing the frame id; the order-preserving
        first-W gather then reproduces the host early-exit fill exactly.
        """
        num_videos = max((int(k) for k in host_bank), default=-1) + 1
        entries = {}
        max_entries = window_size
        for key, frames in host_bank.items():
            vi = int(key)
            flat = []
            for frame in sorted(frames):
                feats = np.asarray(frames[frame], np.float32)
                if feats.size == 0:    # host sampler skips empty frames
                    continue
                if feats.ndim == 1:
                    feats = feats[None]
                for f in feats[:max_per_frame]:
                    flat.append((frame, f))
            entries[vi] = flat
            max_entries = max(max_entries, len(flat))
        max_entries = _cap_frame_table_width(
            'FrameDeviceBank(noun)', max_entries, max_per_video, window_size,
            num_videos)
        frame_ids = np.full((num_videos, max_entries), -1, np.int32)
        rows_tab = np.zeros((num_videos, max_entries), np.int32)
        rows = []
        truncated = 0
        sub_rng = np.random.default_rng(20190607)  # fixed: reproducible banks
        for vi, flat in entries.items():
            if len(flat) > max_entries:
                truncated += 1
                keep = sub_rng.choice(len(flat), max_entries, replace=False)
                flat = [flat[i] for i in sorted(keep)]
            for j, (frame, f) in enumerate(flat):
                frame_ids[vi, j] = frame
                rows_tab[vi, j] = len(rows)
                rows.append(f)
        _warn_frame_truncation('FrameDeviceBank(noun)', truncated, max_entries)
        zero_row = np.zeros((lfb_dim,), np.float32)
        flat_feats = np.stack(rows + [zero_row]) if rows else zero_row[None]
        zero_idx = flat_feats.shape[0] - 1
        rows_tab = np.where(frame_ids < 0, zero_idx, rows_tab)
        return cls(jnp.asarray(flat_feats, dtype), jnp.asarray(frame_ids),
                   jnp.asarray(rows_tab), window_size=window_size,
                   window_mode='epic_noun', fps=fps,
                   max_per_frame=max_per_frame,
                   frames_per_second=frames_per_second)

    def choose_rows(self, video_idx: jax.Array, begin: jax.Array,
                    end: jax.Array) -> jax.Array:
        """(N,) video ids + window [begin, end] (inclusive, in frames) ->
        (N, W) feature-row ids: the first W bank entries within the window,
        in frame order; pad slots point at the zero row."""
        W = self.window_size
        vid = video_idx.astype(jnp.int32)
        fids = self.frame_ids[vid]                     # (N, M)
        rows = self.rows[vid]                          # (N, M)
        M = fids.shape[-1]

        valid = (fids >= 0) & (fids >= begin[:, None]) & (fids <= end[:, None])
        # Order-preserving selection of the first W valid entries.
        key = jnp.where(valid, jnp.arange(M, dtype=jnp.int32), M + 1)
        order = jnp.argsort(key, axis=-1)[:, :W]       # (N, W)
        chosen_valid = jnp.take_along_axis(valid, order, axis=-1)
        chosen_rows = jnp.take_along_axis(rows, order, axis=-1)
        return jnp.where(chosen_valid, chosen_rows, self.zero_idx)

    def gather(self, video_idx: jax.Array, begin: jax.Array,
               end: jax.Array) -> jax.Array:
        """(N, W, D) window features (see :meth:`choose_rows`)."""
        return self.feats[self.choose_rows(video_idx, begin, end)]

    def bind_feats(self, feats: jax.Array) -> '_BoundFeatsBank':
        """Gather view over ``feats`` passed as a traced step operand (see
        :class:`_BoundFeatsBank`)."""
        return _BoundFeatsBank(self, feats)


class _BoundFeatsBank:
    """Bank view whose feature table is a TRACED operand, not a capture.

    Closing a jitted step over a replicated bank embeds the feature table
    as a lowering constant -- at real scale that is a multi-GB constant
    baked into the HLO module (measured in the r4 rehearsal: a 3.47 GB
    captured constant that the tunnel backend re-ships to the remote
    compile service).  The step builders instead pass ``bank.feats`` as an
    explicit jit argument and rebind it here; only the small int32 index
    tables stay captured (MBs).
    """

    def __init__(self, inner, feats: jax.Array):
        self._inner = inner
        self._feats = feats

    def gather(self, *args) -> jax.Array:
        # AvaDeviceBank: (video_idx, sec, rng); FrameDeviceBank:
        # (video_idx, begin, end) -- both route through choose_rows.
        return self._feats[self._inner.choose_rows(*args)]

    def gather_centers(self, video_idx: jax.Array,
                       center: jax.Array) -> jax.Array:
        begin, end = self._inner.window(center)
        return self._feats[self._inner.choose_rows(video_idx, begin, end)]


def sharded_rows_lookup(feats_local: jax.Array, rows: jax.Array,
                        axis: str) -> jax.Array:
    """Row lookup from a mesh-sharded feature table, inside a shard_map body.

    ``feats_local`` is this device's (S, D) row shard of the globally
    (n*S, D) table; ``rows`` are GLOBAL row ids for this device's local
    batch shard.  Every chosen row lives on exactly one device, so the
    lookup is: all_gather the (tiny, int32) row ids, gather the rows each
    device actually holds (others contribute zeros), then
    ``psum_scatter`` the summed windows back so each device keeps exactly
    its own batch shard's windows.  Communication = one tiny index
    all_gather + one window-volume reduce_scatter over ICI — the same
    volume the reference ships host->device per step
    (``lib/datasets/ava.py:300-323``), but never touching the host.
    """
    S = feats_local.shape[0]
    offset = jax.lax.axis_index(axis) * S
    all_rows = jax.lax.all_gather(rows, axis, tiled=True)     # (N_global, M)
    local = all_rows - offset
    ok = (local >= 0) & (local < S)
    vals = feats_local[jnp.clip(local, 0, S - 1)]             # (N, M, D)
    vals = jnp.where(ok[..., None], vals, jnp.zeros((), vals.dtype))
    return jax.lax.psum_scatter(vals, axis, scatter_dimension=0, tiled=True)


class ShardedDeviceBank:
    """A device bank whose feature table is row-sharded over a mesh axis.

    The replicated :class:`AvaDeviceBank` / :class:`FrameDeviceBank` keeps
    one full copy of the (R, D) feature table per chip.  Long videos / large
    datasets make that table the dominant HBM tenant next to activations
    (reference banks are 1-4 GB, ``GETTING_STARTED.md:45``); sharding its
    rows over the data axis cuts per-chip bank HBM by the mesh size, with
    window gathers reassembled on-device by
    :func:`sharded_rows_lookup`.  Only valid under the explicit shard_map
    step (``TPU.SHARD_MAP``): the feature shard enters the body as a
    P(axis) operand, and the small index tables stay replicated (int32,
    MBs not GBs).
    """

    def __init__(self, inner, mesh, axis: str = 'data'):
        from jax.sharding import NamedSharding, PartitionSpec
        if inner.feats is None:
            raise ValueError(
                'bank already sharded: this inner bank\'s feature table was '
                'dropped by a previous shard_bank; reuse that '
                'ShardedDeviceBank (shard_bank() does this automatically)')
        self.inner = inner
        self.mesh = mesh
        self.axis = axis
        n = mesh.shape[axis]
        feats = inner.feats
        pad = (-feats.shape[0]) % n
        if pad:
            feats = jnp.concatenate(
                [feats, jnp.zeros((pad,) + feats.shape[1:], feats.dtype)])
        self.feats = jax.device_put(
            feats, NamedSharding(mesh, PartitionSpec(axis)))
        # Drop the replicated copy: choose_rows only needs the index tables
        # and the stored zero_idx.  Leave a loud tombstone behind so a
        # stray inner.gather fails instead of silently using stale data.
        inner.feats = None
        inner._sharded_wrapper = self

    def local_view(self, feats_local: jax.Array) -> '_ShardLocalBankView':
        """Bind this device's feature shard (a shard_map operand) into a
        gather-compatible view for the step body."""
        return _ShardLocalBankView(self.inner, feats_local, self.axis)


class _ShardLocalBankView:
    """Per-device view of a :class:`ShardedDeviceBank` inside shard_map."""

    def __init__(self, inner, feats_local, axis):
        self._inner = inner
        self._feats_local = feats_local
        self._axis = axis

    def gather(self, video_idx: jax.Array, sec: jax.Array,
               rng: jax.Array) -> jax.Array:
        rows = self._inner.choose_rows(video_idx, sec, rng)
        return sharded_rows_lookup(self._feats_local, rows, self._axis)

    def gather_centers(self, video_idx: jax.Array,
                       center: jax.Array) -> jax.Array:
        begin, end = self._inner.window(center)
        rows = self._inner.choose_rows(video_idx, begin, end)
        return sharded_rows_lookup(self._feats_local, rows, self._axis)


def shard_bank(bank, mesh, axis: str = 'data'):
    """Row-shard a device bank's feature table over ``mesh`` (idempotent).

    Idempotent on both the wrapper AND the inner bank: wrapping the same
    inner instance twice (e.g. one pre-built device bank passed as both the
    train and test bank) returns the existing wrapper instead of failing on
    the dropped feature table.
    """
    if bank is None or isinstance(bank, ShardedDeviceBank):
        return bank
    cached = getattr(bank, '_sharded_wrapper', None)
    if cached is not None:
        assert cached.mesh is mesh and cached.axis == axis, \
            'bank already sharded over a different mesh/axis'
        return cached
    return ShardedDeviceBank(bank, mesh, axis=axis)


def build_device_bank(cfg, host_bank: Dict, video_name_to_idx=None):
    """Convert a host bank (from :func:`lfb_tpu.bank.get_lfb`) into the
    HBM-resident form for the configured dataset.

    EPIC noun banks (multi-feature detector frames, ``epic.py:338-374``)
    flatten into repeated frame ids via :meth:`FrameDeviceBank.build_noun`.

    ``TPU.BANK_DTYPE 'bfloat16'`` stores the feature rows in bf16, halving
    bank HBM; the index tables stay int32 and the host pickle interchange
    stays float32.
    """
    dtype = {'float32': jnp.float32,
             'bfloat16': jnp.bfloat16}[cfg.TPU.BANK_DTYPE]
    if cfg.DATASET == 'ava':
        return AvaDeviceBank.build(
            host_bank, window_size=cfg.LFB.WINDOW_SIZE,
            k=cfg.AVA.LFB_MAX_NUM_FEAT_PER_STEP, lfb_dim=cfg.LFB.LFB_DIM,
            k_store=cfg.TPU.BANK_K_STORE, dtype=dtype)
    if cfg.DATASET == 'charades':
        return FrameDeviceBank.build(
            host_bank, window_size=cfg.LFB.WINDOW_SIZE,
            lfb_dim=cfg.LFB.LFB_DIM, window_mode='charades',
            fps=cfg.CHARADES.FPS,
            clips_per_second=cfg.CHARADES.LFB_CLIPS_PER_SECOND,
            max_per_video=cfg.TPU.BANK_MAX_PER_VIDEO, dtype=dtype)
    if cfg.DATASET == 'epic':
        if cfg.EPIC.CLASS_TYPE == 'noun':
            return FrameDeviceBank.build_noun(
                host_bank, window_size=cfg.LFB.WINDOW_SIZE,
                max_per_frame=cfg.EPIC.MAX_NUM_FEATS_PER_NOUN_LFB_FRAME,
                frames_per_second=cfg.EPIC.NOUN_LFB_FRAMES_PER_SECOND,
                fps=cfg.EPIC.FPS, lfb_dim=cfg.LFB.LFB_DIM,
                max_per_video=cfg.TPU.BANK_MAX_PER_VIDEO, dtype=dtype)
        assert video_name_to_idx is not None, \
            'EPIC verb banks are keyed by video name'
        return FrameDeviceBank.build(
            host_bank, video_name_to_idx, window_size=cfg.LFB.WINDOW_SIZE,
            lfb_dim=cfg.LFB.LFB_DIM, window_mode='epic_verb',
            fps=cfg.EPIC.FPS, max_per_video=cfg.TPU.BANK_MAX_PER_VIDEO,
            dtype=dtype)
    raise ValueError(cfg.DATASET)


def charades_window(center_idx: jax.Array, *, window_size: int,
                    clips_per_second: int, fps: int
                    ) -> Tuple[jax.Array, jax.Array]:
    """[begin, end] frame window for Charades (reference
    ``charades.py:259-261``)."""
    secs = window_size // clips_per_second
    begin = jnp.round(center_idx.astype(jnp.float32)
                      - (float(secs) / 2.0 * fps)).astype(jnp.int32)
    return begin, begin + secs * fps


def epic_verb_window(center_idx: jax.Array, *, window_size: int,
                     fps: int) -> Tuple[jax.Array, jax.Array]:
    """[lower, upper] frame window for EPIC verbs (reference
    ``epic.py:312-316``)."""
    half_len = (window_size * fps) // 2
    c = center_idx.astype(jnp.int32)
    return c - half_len, c + half_len


def epic_noun_window(center_idx: jax.Array, *, window_size: int,
                     max_per_frame: int, frames_per_second: int,
                     fps: int) -> Tuple[jax.Array, jax.Array]:
    """[lower, upper] frame window for EPIC nouns (reference
    ``epic.py:344-347``): ``secs = W / (max_per_frame * frames_per_second)``,
    ``lower = int(c - secs/2 * fps)``, ``upper = int(lower + secs * fps)``.

    Python ``int()`` truncates toward zero; computed here as exact rational
    arithmetic with ``lax.div`` (C-style truncating integer division).
    """
    c = center_idx.astype(jnp.int32)
    num = window_size * fps                  # secs * fps == num / den
    den = max_per_frame * frames_per_second
    lower = jax.lax.div(c * (2 * den) - num, 2 * den)
    upper = jax.lax.div(lower * den + num, den)
    return lower, upper
