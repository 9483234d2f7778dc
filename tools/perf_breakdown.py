#!/usr/bin/env python
"""Per-segment timing of the flagship forward + train step on the real chip.

Splits the inference path (backbone / hm tower / peak-find / sparse reg) and
the train step (target assign / loss forward / forward+backward / optimizer)
into separately chained-scan-timed segments, each with its issued-FLOP count
(XLA cost_analysis), so the utilization of every phase is visible — the
aggregate numbers in bench.py (37% issued-util fwd, 39% train) can't say
WHICH phase is off its roofline.

Methodology identical to bench.py: K applications chained inside one jitted
lax.scan (feedback via a tiny scalar so XLA cannot elide iterations), slope
between two K values cancels dispatch RTT.

Run: python tools/perf_breakdown.py [--train] [--infer] [-B 8]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_BF16_PEAK = 197e12


def chained_time(fn, args, k_lo=2, k_hi=8, reps=3, feedback_arg=0):
    """Seconds per fn application; fn(*args) -> (new_first_arg, scalar)."""
    import jax
    from jax import lax

    def build(K):
        @jax.jit
        def run(*a):
            def body(carry, _):
                a2 = list(a)
                a2[feedback_arg] = carry
                new_c, s = fn(*a2)
                return new_c, s
            c, _ = lax.scan(body, a[feedback_arg], None, length=K)
            return c.reshape(-1)[0]
        return run

    ts = {}
    for K in (k_lo, k_hi):
        f = build(K)
        float(f(*args))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(f(*args))
            best = min(best, time.perf_counter() - t0)
        ts[K] = best
    return (ts[k_hi] - ts[k_lo]) / (k_hi - k_lo)


def issued_flops(fn, *args):
    import jax
    try:
        an = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(an, list):
            an = an[0]
        return float(an.get("flops", 0.0))
    except Exception:
        return 0.0


def fmt(name, sec, gf, B):
    util = (gf * 1e9 / sec) / V5E_BF16_PEAK if sec > 0 else 0.0
    print(f"{name:<34} {sec * 1e3:8.2f} ms  {gf:8.1f} GF issued  "
          f"util {100 * util:5.1f}%  ({sec * 1e3 / B:.3f} ms/frame)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--train", action="store_true")
    ap.add_argument("--infer", action="store_true")
    ap.add_argument("--backbone", action="store_true",
                    help="per-stage breakdown inside the HRNet trunk")
    ap.add_argument("--head", action="store_true",
                    help="hm-tower internals (conv0 / out-conv variants)")
    ap.add_argument("--int8", action="store_true",
                    help="ALSO time the inference segments traced under "
                        "quant.int8_mode (random-cube calibration — "
                        "throughput is scale-independent), so the whole-"
                        "model int8 gap vs the per-conv probes is "
                        "per-segment attributable (VERDICT r4 #4)")
    ap.add_argument("-B", type=int, default=8)
    args_ns = ap.parse_args()
    any_flag = (args_ns.train or args_ns.infer or args_ns.backbone
                or args_ns.head)
    do_train = args_ns.train or not any_flag
    do_infer = args_ns.infer or not any_flag
    do_backbone = args_ns.backbone
    do_head = args_ns.head
    B = args_ns.B

    import jax
    cache_dir = os.path.expanduser("~/.cache/jax_comp_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    import __graft_entry__ as graft

    asm = graft._flagship()
    z, y, x, c = asm.input_shape_zyxc
    model = asm.model
    print(f"# backend {jax.default_backend()}  grid ({z},{y},{x},{c})  B={B}")

    rng = np.random.default_rng(0)
    xb = jax.device_put(rng.random((B, z, y, x, c), np.float32))
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, z, y, x, c)))
    float(xb.sum())

    def feedback(carry, out_sum):
        return carry + (out_sum * 1e-24).astype(carry.dtype)

    if do_backbone:
        print("\n== backbone per-stage (folded, fresh params) ==")
        import flax.linen as nn

        from rtpose_tpu.models.hrnet3d import (MODEL_CONFIGS,
                                               HighResolutionModule)
        from rtpose_tpu.models.layers import GNConv, ResNetBlock
        from rtpose_tpu.ops.fold_conv import FOLD
        from rtpose_tpu.ops.interpolate import resize_trilinear_folded

        cfg_name = asm.model_cfg["backbone"]["backbone_cfg"]
        mc = MODEL_CONFIGS[cfg_name]
        dt = jnp.bfloat16
        Zf, Yf, Xq = z, y, x // FOLD

        def branch_shape(lvl, ch):
            return (B, Zf >> lvl, Yf >> lvl, Xq >> lvl, FOLD * ch)

        def time_module(name, mod, in_shapes):
            xs = [jax.device_put(rng.random(s, np.float32)).astype(dt)
                  for s in in_shapes]
            p = mod.init(jax.random.PRNGKey(0),
                         xs if len(xs) > 1 or isinstance(mod, HighResolutionModule)
                         else xs[0])

            def apply(q, *rest):
                inp = [q, *rest]
                out = mod.apply(p, inp if (len(inp) > 1 or isinstance(
                    mod, HighResolutionModule)) else inp[0])
                leaves = out if isinstance(out, (list, tuple)) else [out]
                s = sum(o.astype(jnp.float32).sum() for o in leaves)
                return feedback(q, s), s
            t = chained_time(apply, tuple(xs))
            gf = 0.0
            try:
                gf = issued_flops(
                    lambda pp, *a: mod.apply(
                        pp, list(a) if (len(a) > 1 or isinstance(
                            mod, HighResolutionModule)) else a[0]), p, *xs)
            except Exception:
                pass
            fmt(name, t, gf / 1e9, B)
            return t

        total = 0.0
        total += time_module(
            "layer1 (ResNetBlock full-res)",
            ResNetBlock(mc["stage2_inplanes"], dtype=dt, folded=True),
            [branch_shape(0, mc["stage2_inplanes"])])
        for sname in ("stage2", "stage3", "stage4"):
            scfg = mc.get(sname)
            if scfg is None:
                continue
            mod = HighResolutionModule(
                num_branches=scfg["num_branches"],
                num_blocks=scfg["num_blocks"],
                num_channels=scfg["num_channels"], dtype=dt, folded=True)
            shapes = [branch_shape(i, c)
                      for i, c in enumerate(scfg["num_channels"])]
            total += time_module(f"{sname} ({scfg['num_branches']}br)", mod,
                                 shapes)
        # transitions (strided GNConvs creating the new branch)
        for i, (src_ch, dst_ch) in enumerate(
                [(mc["stage2"]["num_channels"][-1],
                  mc["stage3"]["num_channels"][-1]),
                 (mc["stage3"]["num_channels"][-1],
                  mc.get("stage4", mc["stage3"])["num_channels"][-1])]):
            lvl = i + 1
            total += time_module(
                f"transition{i + 2} (s2 GNConv)",
                GNConv(dst_ch, kernel=3, stride=2, relu=True, dtype=dt,
                       folded=True), [branch_shape(lvl, src_ch)])

        # final fuse: upsample all to full res + concat + 1x1
        class FinalFuse(nn.Module):
            chans: tuple

            @nn.compact
            def __call__(self, xs):
                top = xs[0]
                tz, ty, txf = top.shape[1:4]
                ups = [resize_trilinear_folded(f, (tz, ty, txf * FOLD))
                       for f in xs[1:]]
                out = jnp.concatenate([top, *ups], axis=-1)
                return out

        s4 = mc.get("stage4", mc["stage3"])
        total += time_module(
            "final fuse (resizes+concat)", FinalFuse(tuple(s4["num_channels"])),
            [branch_shape(i, c) for i, c in enumerate(s4["num_channels"])])
        print(f"  sum of stages: {total * 1e3:.2f} ms")

    if do_head:
        print("\n== hm tower internals (folded feat, fresh params) ==")
        from rtpose_tpu.ops.fold_conv import (FOLD, conv3d_folded,
                                              conv3d_folded_gather)

        Cin = asm.model_cfg["pose_head"]["in_channels"]
        hc = 32
        shp = (B, z, y, x // FOLD, FOLD * Cin)
        feat = jax.device_put(rng.random(shp, np.float32)).astype(jnp.bfloat16)
        float(feat.astype(jnp.float32).sum())
        w0 = jax.device_put(rng.normal(size=(3, 3, 3, Cin, hc))
                            .astype(np.float32)).astype(jnp.bfloat16)
        w1 = jax.device_put(rng.normal(size=(3, 3, 3, hc, 1))
                            .astype(np.float32))

        def seg(fn, name, *consts):
            def apply(q):
                o = fn(q, *consts)
                s = o.astype(jnp.float32).sum()
                return feedback(q, s), s
            t = chained_time(apply, (feat,))
            gf = issued_flops(fn, feat, *consts)
            fmt(name, t, gf / 1e9, B)
            return t

        seg(lambda q, w: conv3d_folded_gather(q, w), "conv0 gather C128->32", w0)
        seg(lambda q, w: conv3d_folded(q, w), "conv0 fold4 C128->32", w0)

        h32 = jax.jit(lambda q: jax.nn.relu(conv3d_folded_gather(q, w0)))(feat)
        h32 = jax.block_until_ready(h32)

        def seg_h(fn, name, *consts):
            def apply(q):
                o = fn(q, *consts)
                s = o.astype(jnp.float32).sum()
                return feedback(q, s), s
            t = chained_time(apply, (h32,))
            gf = issued_flops(fn, h32, *consts)
            fmt(name, t, gf / 1e9, B)
            return t

        seg_h(lambda q, w: conv3d_folded_gather(q.astype(jnp.float32),
                                                w.astype(jnp.float32)),
              "out gather C32->1 f32", w1)
        seg_h(lambda q, w: conv3d_folded_gather(q, w.astype(jnp.bfloat16)),
              "out gather C32->1 bf16", w1)
        seg_h(lambda q, w: conv3d_folded(q, w.astype(jnp.bfloat16)),
              "out fold4 C32->1 bf16", w1)
        # wide-out trick: compute all FOLD x-positions AND kz z-slabs as
        # output lanes? simplest alternative: pad Co to 8 targets
        w8 = jnp.tile(w1.astype(jnp.bfloat16), (1, 1, 1, 1, 8))
        seg_h(lambda q, w: conv3d_folded_gather(q, w),
              "out gather C32->8 bf16 (pad probe)", w8)

    if do_infer:
        from contextlib import nullcontext

        def infer_segments(label, ctx):
            """Time the inference segments with conv dispatch under ``ctx``
            (nullcontext = bf16 path, quant.int8_mode = int8 path).  The
            context is entered around every trace (chained_time compiles
            inside the call; issued_flops lowers inside too)."""
            print(f"\n== inference segments ({label}) ==")

            def timed(name, seg_fn, args, flops_fn=None, flops_args=()):
                with ctx():
                    t = chained_time(seg_fn, args)
                    gf = (issued_flops(flops_fn, *flops_args)
                          if flops_fn is not None else 0.0)
                fmt(name, t, gf / 1e9, B)
                return t

            # 1. backbone (reader -> HRNet -> fused feat, folded)
            def seg_backbone(xc):
                feat = model.apply(params, xc, method="extract_feat")
                s = feat.astype(jnp.float32).sum()
                return feedback(xc, s), s
            t_bb = timed("backbone(extract_feat)", seg_backbone, (xb,),
                         lambda p, xx: model.apply(p, xx,
                                                   method="extract_feat"),
                         (params, xb))

            # static feat for head segments
            with ctx():
                feat = jax.jit(lambda p, xx: model.apply(
                    p, xx, method="extract_feat"))(params, xb)
            feat = jax.block_until_ready(feat)

            def head_hm(p, f):
                return model.apply(
                    p, f, method=lambda m, ff: m.head_m(ff, branch="hm")
                )[0]["hm"]

            def seg_hm(f):
                hm = head_hm(params, f)
                s = hm.sum()
                return feedback(f, s), s
            t_hm = timed("hm tower", seg_hm, (feat,), head_hm, (params, feat))

            with ctx():
                hm = jax.jit(head_hm)(params, feat)
            hm = jax.block_until_ready(hm)
            Z, Y, X, C = hm.shape[1:]

            def seg_argmax(h):
                flat = jnp.argmax(h.reshape(B, -1, C)[..., 0], axis=1)
                s = flat.sum().astype(jnp.float32)
                return feedback(h, s), s
            t_am = timed("peak argmax", seg_argmax, (hm,))

            flat = jax.jit(lambda h: jnp.argmax(
                h.reshape(B, -1, C)[..., 0], axis=1))(hm)
            zc = flat // (Y * X)
            yc = (flat % (Y * X)) // X
            xc_ = flat % X

            def reg_fn(p, f):
                return model.apply(
                    p, f, zc, yc, xc_, (Z, Y, X),
                    method=lambda m, ff, a, b2, c2, g: m._reg_patches(
                        ff, a, b2, c2, g))

            def seg_reg(f):
                r = reg_fn(params, f)
                s = r.astype(jnp.float32).sum()
                return feedback(f, s), s
            t_rg = timed("sparse reg patches", seg_reg, (feat,), reg_fn,
                         (params, feat))

            def seg_full(xc2):
                hm2, rp, ind = model.apply(params, xc2,
                                           method="predict_sparse")
                s = hm2.astype(jnp.float32).sum() + rp.astype(jnp.float32).sum()
                return feedback(xc2, s), s
            t_full = timed("FULL predict_sparse", seg_full, (xb,),
                           lambda p, xx: model.apply(p, xx,
                                                     method="predict_sparse"),
                           (params, xb))
            print(f"  sum of segments: "
                  f"{(t_bb + t_hm + t_am + t_rg) * 1e3:.2f} ms")
            return dict(backbone=t_bb, hm=t_hm, argmax=t_am, reg=t_rg,
                        full=t_full)

        base = infer_segments("bf16", nullcontext)
        if args_ns.int8:
            from rtpose_tpu.ops import quant
            xcal = jax.device_put(
                rng.random((B, z, y, x, c), np.float32))
            scales = quant.calibration_scales(
                lambda b: model.apply(params, b, method="predict_sparse"),
                [xcal])
            print(f"# int8: {len(scales)} calibrated conv sites")
            q8 = infer_segments(
                "int8", lambda: quant.int8_mode(scales))
            for k in base:
                if q8[k] > 0:
                    print(f"  int8 speedup {k:<10} {base[k] / q8[k]:.2f}x")
            # opt-in resize quantization (tools/export.py --int8_resize):
            # recalibrate with the resize sites included, re-time the
            # backbone (the only segment containing the final-fuse resizes)
            scales_r = quant.calibration_scales(
                lambda b: model.apply(params, b, method="predict_sparse"),
                [xcal], exclude=quant.INT8_RESIZE_EXCLUDE)
            print(f"# int8+resize: {len(scales_r)} calibrated sites")
            q8r = infer_segments(
                "int8+resize",
                lambda: quant.int8_mode(scales_r,
                                        exclude=quant.INT8_RESIZE_EXCLUDE))
            for k in base:
                if q8r[k] > 0:
                    print(f"  int8+resize speedup {k:<10} "
                          f"{base[k] / q8r[k]:.2f}x")

    if do_train:
        print("\n== train segments ==")
        from rtpose_tpu.engine import create_train_state, make_train_step
        from rtpose_tpu.engine.steps import targets_from_batch
        from rtpose_tpu.models.losses import fast_focal_loss_logits
        from rtpose_tpu.solver import adam_one_cycle, make_one_cycle_fns
        import optax

        spec = asm.target_spec
        head = asm.head
        pelvis = np.asarray(spec.pc_range_min_xyz, np.float32) + \
            np.array([1.0, 2.0, 1.0], np.float32)
        batch = {
            "rdr_tensor": xb,
            "poses": jax.device_put(np.tile(pelvis, (B, 1, 15, 1)).astype(np.float32)),
            "num_poses": jax.device_put(np.ones((B,), np.int32)),
        }

        lr_fn, mom_fn = make_one_cycle_fns(1000, 2e-3)
        opt = adam_one_cycle(lr_fn, mom_fn)
        state = create_train_state(model, opt, jnp.zeros((1, z, y, x, c)))

        # 1. target assignment
        def seg_targets(xc2):
            ex = targets_from_batch(dict(batch, rdr_tensor=xc2), spec)
            s = ex["hm"][0].sum()
            return feedback(xc2, s), s
        t_tg = chained_time(seg_targets, (xb,))
        fmt("target assign", t_tg, 0.0, B)

        example = jax.jit(lambda: targets_from_batch(batch, spec))()
        example = jax.block_until_ready(example)

        def loss_fn(params, xc2):
            ind = example["ind"][0]
            hm_logits, reg_at_ind = model.apply(params, xc2, ind,
                                                method="forward_sparse_train")
            hm_loss = fast_focal_loss_logits(hm_logits, example["hm"][0], ind,
                                             example["mask"][0], example["cat"][0])
            maskf = example["mask"][0].astype(jnp.float32)[:, :, None]
            target = example["anno_pose"][0]
            l1 = jnp.abs(reg_at_ind.astype(jnp.float32) * maskf - target * maskf)
            rl = jnp.sum(l1 / (jnp.sum(maskf) + 1e-4), axis=(0, 1))
            code_w = jnp.asarray(head.code_weights, jnp.float32)
            return hm_loss + head.weight * jnp.sum(rl * code_w)

        # 2. loss forward only
        def seg_lfwd(xc2):
            l = loss_fn(state.params, xc2)
            return feedback(xc2, l), l
        t_lf = chained_time(seg_lfwd, (xb,))
        gf_lf = issued_flops(loss_fn, state.params, xb)
        fmt("loss forward (sparse)", t_lf, gf_lf / 1e9, B)

        # 3. forward+backward
        def vg(params, xc2):
            return jax.value_and_grad(loss_fn)(params, xc2)

        def seg_vg(xc2):
            l, g = vg(state.params, xc2)
            # consume the grads or XLA dead-code-eliminates the backward
            gs = sum(jnp.sum(x_.astype(jnp.float32))
                     for x_ in jax.tree.leaves(g))
            return feedback(xc2, l + gs), l
        t_vg = chained_time(seg_vg, (xb,))
        gf_vg = issued_flops(vg, state.params, xb)
        fmt("loss fwd+bwd (value_and_grad)", t_vg, gf_vg / 1e9, B)
        fmt("  -> backward alone", t_vg - t_lf, (gf_vg - gf_lf) / 1e9, B)

        # 4. optimizer (update + apply + finite guard)
        grads = jax.jit(lambda p, xx: vg(p, xx)[1])(state.params, xb)
        grads = jax.block_until_ready(grads)

        def opt_step(params, opt_state, grads):
            updates, new_os = opt.update(grads, opt_state, params)
            new_p = optax.apply_updates(params, updates)
            finite = jnp.isfinite(optax.global_norm(grads))
            new_p = jax.tree.map(lambda n, o: jnp.where(finite, n, o),
                                 new_p, params)
            new_os = jax.tree.map(lambda n, o: jnp.where(finite, n, o),
                                  new_os, opt_state)
            return new_p, new_os

        def seg_opt(g):
            new_p, _ = opt_step(state.params, state.opt_state, g)
            s = sum(jnp.sum(l.astype(jnp.float32))
                    for l in jax.tree.leaves(new_p))
            return jax.tree.map(
                lambda gg: gg + (s * 1e-24).astype(gg.dtype), g), s
        # pytree feedback: time directly (optimizer is small; RTT-dominated
        # errors acceptable at this scale) via scan over stacked dummy
        import jax as _jax

        def build_opt(K):
            @_jax.jit
            def run(p, os_, g):
                from jax import lax

                def body(carry, _):
                    p2, os2 = carry
                    p3, os3 = opt_step(p2, os_, g)
                    return (p3, os3), 0.0
                (pK, _), _ = lax.scan(body, (p, os_), None, length=K)
                return jax.tree.leaves(pK)[0].reshape(-1)[0]
            return run
        ts = {}
        for K in (2, 8):
            f = build_opt(K)
            float(f(state.params, state.opt_state, grads))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                float(f(state.params, state.opt_state, grads))
                best = min(best, time.perf_counter() - t0)
            ts[K] = best
        t_op = (ts[8] - ts[2]) / 6
        fmt("optimizer (adam+clip+guard)", t_op, 0.0, B)

        # 5. full fused step
        step = make_train_step(model, head, spec, opt, lr_fn=lr_fn,
                               sparse_reg=True)

        def build_full(K):
            @_jax.jit
            def run(s, b):
                from jax import lax

                def body(st, _):
                    s2, m = step(st, b)
                    return s2, m["loss"]
                s2, losses = lax.scan(body, s, None, length=K)
                return losses[-1]
            return run
        ts = {}
        for K in (2, 6):
            f = build_full(K)
            float(f(state, batch))
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                float(f(state, batch))
                best = min(best, time.perf_counter() - t0)
            ts[K] = best
        t_full = (ts[6] - ts[2]) / 4
        fmt("FULL train step", t_full, 0.0, B)
        print(f"  sum of segments: {(t_tg + t_vg + t_op) * 1e3:.2f} ms; "
              f"steps/s {1 / t_full:.2f}")


if __name__ == "__main__":
    main()
