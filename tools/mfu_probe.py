"""Forward-MFU attribution probe (train 40% vs inference 49% gap).

The r3 whole-step bisection proved the backward pass is at its 2.0x
FLOP bound and pinned the train-vs-inference MFU gap to the *forward*
at train shapes (B=8, 32x224^2) vs eval shapes (B=16, 32x256^2).  This
tool names the ops responsible:

  grid  -- whole-forward loss timing over the (batch, crop) grid, with
           XLA cost_analysis FLOPs, separating the batch effect from
           the crop effect.
  conv  -- traces the flagship forward with a recorder patched over
           conv3d / conv1x1 / attention, dedupes the op signatures, and
           microbenches each on the chip at both shape regimes ->
           per-op MFU table sorted by train-shape time share.
  flat  -- A/B: the worst pointwise/temporal convs as lax.conv vs a
           flattened (B*T*H*W, C) MXU matmul, testing the hypothesis
           that crop-224's 14x14 spatial tiles are the waste.

Usage:  python tools/mfu_probe.py [grid|conv|flat|all]

Reference hot loop being attributed: the reference never measured MFU
at all (``/root/reference/tools/train_net.py:148-176`` logs wall-clock
iter time only); this probe is TPU-native accounting.
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time
from typing import Dict, Tuple

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# v5e bf16 peak; BENCHMARKS.md train-MFU rows use the same constant.
PEAK_FLOPS = 197e12


def _flagship(train_crop, train_batch):
    from __graft_entry__ import _flagship_cfg
    from lfb_tpu.models import build_spec
    cfg = _flagship_cfg(tiny=False)
    cfg.TRAIN.VIDEO_LENGTH = 32
    cfg.TRAIN.CROP_SIZE = train_crop
    cfg.TRAIN.BATCH_SIZE = train_batch
    cfg.TPU.REMAT = ''
    return cfg, build_spec(cfg, 'train')


def _train_batch(spec, B, crop, boxes_per_clip=4):
    import jax
    rng = np.random.RandomState(0)
    n = B * boxes_per_clip
    t = 32
    return {
        'data': jax.device_put(
            0.1 * rng.randn(B, t, crop, crop, 3).astype(np.float32)),
        'labels': jax.device_put(
            (rng.rand(n, 80) > 0.95).astype(np.float32)),
        'proposals': jax.device_put(np.stack(
            [np.repeat(np.arange(B), boxes_per_clip)]
            + [rng.uniform(0, crop, n) for _ in range(4)], 1)
            .astype(np.float32)),
        'box_mask': jax.device_put(np.ones(n, np.float32)),
        'lfb': jax.device_put(
            rng.randn(n, spec.fbo.num_lfb_feat, 2048).astype(np.float32)),
    }


def _timed(fn, args, iters):
    """sec/iter for jitted fn(*args) with an on-device serialization dep
    (single-element slice -- cheaper than the full-output reduce in
    bench.timed_device_loop, which would inflate bandwidth-bound ops)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def loop(args):
        def body(i, carry):
            args, acc = carry
            out = fn(*args)
            leaf = jax.tree_util.tree_leaves(out)[0]
            dep = jnp.reshape(leaf, (-1,))[0].astype(jnp.float32)
            first, *rest = args
            first = first + (0.0 * dep).astype(first.dtype)
            return ((first, *rest), acc + dep)
        return jax.lax.fori_loop(0, iters, body, (args, jnp.float32(0)))[1]

    float(loop(args))
    t0 = time.perf_counter()
    float(loop(args))
    return (time.perf_counter() - t0) / iters


# ---------------------------------------------------------------- grid

def run_grid():
    import jax
    import jax.numpy as jnp
    from lfb_tpu.models import forward, init_params
    from lfb_tpu.utils.flops import cost_analysis

    print('# Whole-forward loss over the (batch, crop) grid')
    print('| B | crop | ms | TF | TFLOP/s | MFU |')
    print('|---|---|---|---|---|---|')
    for B, crop in [(8, 224), (16, 224), (8, 256), (16, 256)]:
        cfg, spec = _flagship(crop, B)
        params = init_params(jax.random.PRNGKey(0), spec)
        batch = _train_batch(spec, B, crop)

        def fwd_loss(data, params, proposals, box_mask, labels, lfb):
            out = forward(spec, params,
                          {'data': data, 'proposals': proposals,
                           'box_mask': box_mask, 'labels': labels,
                           'lfb': lfb},
                          train=True, rng=jax.random.PRNGKey(0))
            return out['loss']

        args = (batch['data'], params, batch['proposals'],
                batch['box_mask'], batch['labels'], batch['lfb'])
        costs = cost_analysis(jax.jit(fwd_loss), *args)
        tf = costs.get('flops', 0.0) / 1e12
        dt = _timed(fwd_loss, args, 20)
        tps = tf / dt
        print('| {} | {} | {:.1f} | {:.2f} | {:.1f} | {:.0%} |'.format(
            B, crop, dt * 1e3, tf, tps, tps * 1e12 / PEAK_FLOPS))
        sys.stdout.flush()


# ---------------------------------------------------------------- conv

@dataclasses.dataclass(frozen=True)
class ConvSig:
    kind: str                     # 'conv3d' | 'conv1x1' | 'attention'
    x_shape: Tuple[int, ...]
    w_shape: Tuple[int, ...]
    strides: Tuple[int, ...] = (1, 1, 1)
    dilation: Tuple[int, ...] = (1, 1, 1)
    groups: int = 1

    def flops(self) -> float:
        if self.kind == 'attention':
            B, L, d = self.x_shape          # q shape
            Lkv = self.w_shape[1]           # k shape stored in w_shape
            return 2.0 * B * L * Lkv * d * 2
        if self.kind == 'conv1x1':
            cin, cout = self.w_shape[-2], self.w_shape[-1]
            m = int(np.prod(self.x_shape[:-1]))
            return 2.0 * m * cin * cout
        kt, kh, kw, cin_g, cout = self.w_shape
        Bt, T, H, W, _ = self.x_shape
        st, sh, sw = self.strides
        out_sp = Bt * (T // st) * (H // sh) * (W // sw)
        return 2.0 * out_sp * cout * cin_g * kt * kh * kw

    def label(self) -> str:
        if self.kind == 'attention':
            return 'attn B{} L{} Lkv{} d{}'.format(
                self.x_shape[0], self.x_shape[1], self.w_shape[1],
                self.x_shape[2])
        if self.kind == 'conv1x1':
            return '1x1 {}->{} @{}'.format(
                self.w_shape[-2], self.w_shape[-1],
                'x'.join(map(str, self.x_shape[:-1])))
        kt, kh, kw, cin_g, cout = self.w_shape
        tag = '{}x{}x{} {}->{}'.format(kt, kh, kw, cin_g * self.groups, cout)
        if self.strides != (1, 1, 1):
            tag += ' s{}'.format(max(self.strides))
        if self.dilation != (1, 1, 1):
            tag += ' d{}'.format(max(self.dilation))
        return tag + ' @{}'.format('x'.join(map(str, self.x_shape[:-1])))


def collect_sigs(spec, B, crop) -> Dict[ConvSig, int]:
    """Trace the forward with recorders patched over the backbone's op
    symbols; returns {signature: count}."""
    import jax
    from lfb_tpu.models import backbone as bb
    from lfb_tpu.models import forward
    from lfb_tpu.models import init_params
    from lfb_tpu.ops import conv3d as conv_mod

    sigs: Dict[ConvSig, int] = {}

    real_conv3d, real_conv1x1 = bb.conv3d, bb.conv1x1
    real_attn = bb.scaled_softmax_attention

    def rec_conv3d(x, w, *, strides=(1, 1, 1), padding=(0, 0, 0),
                   dilation=(1, 1, 1), groups=1, bias=None,
                   compute_dtype=None):
        sig = ConvSig('conv3d', tuple(x.shape), tuple(w.shape),
                      tuple(strides), tuple(dilation), groups)
        sigs[sig] = sigs.get(sig, 0) + 1
        return real_conv3d(x, w, strides=strides, padding=padding,
                           dilation=dilation, groups=groups, bias=bias,
                           compute_dtype=compute_dtype)

    def rec_conv1x1(x, w, bias=None):
        sig = ConvSig('conv1x1', tuple(x.shape), tuple(w.shape))
        sigs[sig] = sigs.get(sig, 0) + 1
        return real_conv1x1(x, w, bias)

    def rec_attn(q, k, v, **kw):
        sig = ConvSig('attention', tuple(q.shape), tuple(k.shape))
        sigs[sig] = sigs.get(sig, 0) + 1
        return real_attn(q, k, v, **kw)

    bb.conv3d, bb.conv1x1 = rec_conv3d, rec_conv1x1
    bb.scaled_softmax_attention = rec_attn
    try:
        params = jax.eval_shape(
            lambda: init_params(jax.random.PRNGKey(0), spec))
        batch = jax.eval_shape(lambda: {
            k: jax.numpy.zeros(v, jax.numpy.float32) for k, v in {
                'data': (B, 32, crop, crop, 3),
                'labels': (B * 4, 80),
                'proposals': (B * 4, 5),
                'box_mask': (B * 4,),
                'lfb': (B * 4, spec.fbo.num_lfb_feat, 2048)}.items()})
        jax.eval_shape(
            lambda p, b: forward(spec, p, b, train=True,
                                 rng=jax.random.PRNGKey(0)),
            params, batch)
    finally:
        bb.conv3d, bb.conv1x1 = real_conv3d, real_conv1x1
        bb.scaled_softmax_attention = real_attn
    return sigs


def bench_sig(sig: ConvSig, iters=30) -> float:
    import jax
    import jax.numpy as jnp
    from lfb_tpu.ops.conv3d import conv1x1, conv3d
    from lfb_tpu.ops.attention import scaled_softmax_attention

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, sig.x_shape, jnp.bfloat16)
    if sig.kind == 'attention':
        k = jax.random.normal(key, sig.w_shape, jnp.bfloat16)
        v = jax.random.normal(key, sig.w_shape, jnp.bfloat16)
        d = sig.x_shape[-1]
        fn = lambda q, k, v: scaled_softmax_attention(
            q, k, v, scale=d ** -0.5, use_softmax=True, use_pallas=True)
        return _timed(fn, (x, k, v), iters)
    w = jax.random.normal(key, sig.w_shape, jnp.bfloat16) * 0.05
    if sig.kind == 'conv1x1':
        return _timed(conv1x1, (x, w), iters)
    kt, kh, kw = sig.w_shape[:3]
    pad = (kt // 2, (kh // 2) * sig.dilation[1], (kw // 2) * sig.dilation[2])
    fn = lambda x, w: conv3d(x, w, strides=sig.strides, padding=pad,
                             dilation=sig.dilation, groups=sig.groups)
    return _timed(fn, (x, w), iters)


def run_conv():
    regimes = [(8, 224), (8, 256), (16, 256)]
    tables = {}
    for B, crop in regimes:
        cfg, spec = _flagship(crop, B)
        tables[(B, crop)] = collect_sigs(spec, B, crop)
        n_ops = sum(tables[(B, crop)].values())
        print('# regime B={} crop={}: {} op calls, {} unique signatures'
              .format(B, crop, n_ops, len(tables[(B, crop)])))
    sys.stdout.flush()

    # Bench every signature of every regime; join rows by structural
    # identity (kind, kernel, channels, stride) so the same logical layer
    # lines up across regimes.
    def struct_key(sig: ConvSig):
        if sig.kind == 'conv3d':
            return ('conv3d', sig.w_shape, sig.strides, sig.dilation,
                    sig.groups, sig.x_shape[1])   # T disambiguates res2/res3+
        if sig.kind == 'conv1x1':
            return ('conv1x1', sig.w_shape[-2], sig.w_shape[-1],
                    sig.x_shape[1] if len(sig.x_shape) == 5 else 0)
        return ('attention', sig.x_shape[-1], sig.x_shape[1])

    results: Dict[Tuple, Dict] = {}
    for (B, crop), sigs in tables.items():
        for sig, count in sorted(sigs.items(), key=lambda kv: -kv[0].flops()):
            sk = struct_key(sig)
            row = results.setdefault(sk, {})
            dt = bench_sig(sig)
            row[(B, crop)] = {
                'sig': sig, 'count': count, 'ms': dt * 1e3,
                'mfu': sig.flops() / dt / PEAK_FLOPS,
                'total_ms': dt * 1e3 * count,
            }
            print('.', end='', flush=True)
    print()

    train, mid, ev = (8, 224), (8, 256), (16, 256)
    rows = sorted(results.values(),
                  key=lambda r: -r.get(train, {}).get('total_ms', 0.0))
    print('| op (train shape) | n | train ms (sum) | MFU@8/224 | MFU@8/256 |'
          ' MFU@16/256 |')
    print('|---|---|---|---|---|---|')
    tot = {r: [0.0, 0.0] for r in regimes}   # [ms, flops/peak-sec]
    for row in rows:
        tr = row.get(train)
        fm = lambda reg: ('{:.0%}'.format(row[reg]['mfu'])
                          if reg in row else '-')
        label = (tr or next(iter(row.values())))['sig'].label()
        print('| {} | {} | {:.2f} | {} | {} | {} |'.format(
            label, tr['count'] if tr else '-',
            tr['total_ms'] if tr else float('nan'),
            fm(train), fm(mid), fm(ev)))
        for reg in regimes:
            if reg in row:
                tot[reg][0] += row[reg]['total_ms']
                tot[reg][1] += (row[reg]['sig'].flops() * row[reg]['count']
                                / 1e12)
    for reg in regimes:
        ms, tf = tot[reg]
        print('aggregate B={} crop={}: {:.1f} ms, {:.2f} TF -> {:.0%} MFU'
              .format(reg[0], reg[1], ms, tf,
                      tf / (ms / 1e3) * 1e12 / PEAK_FLOPS))
    sys.stdout.flush()


# ---------------------------------------------------------------- flat

# The per-op table's worst train-shape offenders: pointwise projections
# and kTx1x1 temporal convs at the crop-224 res-stage widths.
# (label, B, T, H, W, Cin, Cout, kT)
FLAT_CASES = [
    ('res2 2a 3x1x1', 8, 32, 56, 56, 256, 64, 3),
    ('res2 2c 1x1x1', 8, 32, 56, 56, 64, 256, 1),
    ('res3 2a 3x1x1', 8, 16, 28, 28, 512, 128, 3),
    ('res3 2c 1x1x1', 8, 16, 28, 28, 128, 512, 1),
    ('res4 2a 3x1x1', 8, 16, 14, 14, 1024, 256, 3),
    ('res4 2c 1x1x1', 8, 16, 14, 14, 256, 1024, 1),
    ('res5 2a 3x1x1', 8, 16, 14, 14, 2048, 512, 3),
    ('res5 2c 1x1x1', 8, 16, 14, 14, 512, 2048, 1),
    # crop-256 control: same res4 case at 16x16 spatial
    ('res4 2c @16x16', 8, 16, 16, 16, 256, 1024, 1),
]


def _flat_1x1(x, w):
    """kTx1x1 conv expressed as (B*T*H*W, Cin) @ (Cin, Cout) matmuls
    (one shifted matmul per temporal tap), removing all spatial tiling.

    Taps accumulate in f32 (preferred_element_type) to match conv3d's
    in-conv f32 accumulation, so the A/B is numerics-matched."""
    import jax.numpy as jnp
    from jax import lax
    B, T, H, W, C = x.shape
    kt = w.shape[0]
    w2 = w.reshape(kt, w.shape[3], w.shape[4])
    mm = lambda a, b: lax.dot(a, b, preferred_element_type=jnp.float32)
    if kt == 1:
        y = mm(x.reshape(-1, C), w2[0])
        return y.astype(x.dtype).reshape(B, T, H, W, -1)
    pad = kt // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0), (0, 0), (0, 0)))
    y = None
    for k in range(kt):
        term = mm(xp[:, k:k + T].reshape(-1, C), w2[k])
        y = term if y is None else y + term
    return y.astype(x.dtype).reshape(B, T, H, W, -1)


def run_flat():
    import jax
    import jax.numpy as jnp
    from lfb_tpu.ops.conv3d import conv3d

    print('| case | conv ms (MFU) | flat ms (MFU) | speedup |')
    print('|---|---|---|---|')
    for label, B, T, H, W, Ci, Co, kT in FLAT_CASES:
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (B, T, H, W, Ci), jnp.bfloat16)
        w = jax.random.normal(key, (kT, 1, 1, Ci, Co), jnp.bfloat16) * 0.05
        fl = 2.0 * B * T * H * W * Ci * Co * kT
        conv_fn = lambda x, w: conv3d(x, w, padding=(kT // 2, 0, 0))
        t_conv = _timed(conv_fn, (x, w), 30)
        t_flat = _timed(_flat_1x1, (x, w), 30)
        a = np.asarray(conv_fn(x, w), np.float32)
        b = np.asarray(_flat_1x1(x, w), np.float32)
        err = np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-9)
        # bf16 inputs + f32 accumulation on both sides: anything beyond
        # ~2e-2 relative means the flat rewrite's semantics drifted and
        # the speedup column is bogus -- flag the row loudly.
        flag = '  <-- MISMATCH, row invalid' if err > 2e-2 else ''
        print('| {} | {:.2f} ({:.0%}) | {:.2f} ({:.0%}) | {:.2f}x err={:.1e} |{}'
              .format(label, t_conv * 1e3, fl / t_conv / PEAK_FLOPS,
                      t_flat * 1e3, fl / t_flat / PEAK_FLOPS,
                      t_conv / t_flat, err, flag))
        sys.stdout.flush()


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else 'all'
    if mode in ('grid', 'all'):
        run_grid()
    if mode in ('conv', 'all'):
        run_conv()
    if mode in ('flat', 'all'):
        run_flat()


if __name__ == '__main__':
    main()
