#!/usr/bin/env python
"""Honest (scan_bench) per-stage cost breakdown of the parity estimator at
B=16: cumulative levels of the net composition, so L(k) - L(k-1) is the cost
of stage k. All measurements through scan_bench (perturbed inputs, carried
dependency) — per-call timing of identical executions is unreliable through
the device tunnel."""
import sys

import jax
import jax.numpy as jnp
from flax import linen as nn

sys.path.insert(0, "/root/repo/scripts")
sys.path.insert(0, "/root/repo")
from perfutil import scan_bench


def main():
    from rgbmanip_tpu.models.pose_estimator.nets.pspnet import PSPNet
    from rgbmanip_tpu.models.pose_estimator.nets.stereo import (
        CostRegNet, homo_warp_batched)
    from rgbmanip_tpu.ops.gather import flat_gather, point_sample_matmul

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    S, D, N, C = 224, 24, 1024, 32
    vs = 2
    Sv = S // vs
    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    img = jax.random.normal(key, (B, S, S, 3), dt)
    choose = jnp.tile(jnp.arange(N, dtype=jnp.int32)[None], (B, 1))
    proj = jnp.tile(jnp.eye(4, dtype=jnp.float32), (B, 1, 1))
    proj2 = proj.at[:, 0, 3].set(0.1)
    depths = jnp.tile(jnp.linspace(0.1, 2.4, D)[None], (B, 1))

    psp = PSPNet(backend="resnet34", dtype=dt)
    pv = psp.init(key, img, False)
    reg = CostRegNet(base=8, dtype=dt)
    rv = reg.init(key, jnp.zeros((1, D, Sv, Sv, C), dt), False)

    scale_mat = jnp.diag(jnp.array([1 / vs, 1 / vs, 1.0, 1.0]))
    p1v = jnp.einsum("ij,bjk->bik", scale_mat, proj)
    p2v = jnp.einsum("ij,bjk->bik", scale_mat, proj2)

    def stage(level):
        def f(im):
            f1 = psp.apply(pv, im, False)
            f2 = psp.apply(pv, im + 1.0, False)
            out = [f1.sum(), f2.sum()]
            if level >= 1:   # avg_pool + warps + fuse
                f1v = nn.avg_pool(f1, (vs, vs), strides=(vs, vs))
                f2v = nn.avg_pool(f2, (vs, vs), strides=(vs, vs))
                w2 = homo_warp_batched(f2v, p2v, p1v, depths, "nearest")
                w1 = homo_warp_batched(f1v, p1v, p2v, depths, "nearest")
                fused1 = f1v[:, None] + w2
                fused2 = f2v[:, None] + w1
                out.append(fused1.sum() + fused2.sum())
            if level >= 2:   # NOCS point gathers
                py = (choose // S).astype(jnp.float32)
                px = (choose % S).astype(jnp.float32)
                n1 = point_sample_matmul(f1, py, px)
                n2 = point_sample_matmul(f2, py, px)
                out.append(n1.sum() + n2.sum())
            if level >= 3:   # cost regularization
                cost1 = reg.apply(rv, fused1, False)[..., 0]
                cost2 = reg.apply(rv, fused2, False)[..., 0]
                out.append(cost1.sum() + cost2.sum())
            if level >= 4:   # point depth softmax
                def point_depth(cost):
                    vol = jnp.moveaxis(cost, 1, -1)
                    pts = point_sample_matmul(vol, py / vs, px / vs)
                    prob = jax.nn.softmax(pts.astype(jnp.float32), axis=-1)
                    depth = (prob * depths[:, None, :]).sum(-1)
                    return prob, depth
                prob1, dep1 = point_depth(cost1)
                prob2, dep2 = point_depth(cost2)
                out.append(dep1.sum() + dep2.sum())
            if level >= 5:   # pose branch volume gather + weighted sum
                d_offs = (jnp.arange(D, dtype=jnp.int32) * (Sv * Sv))[None, None, :]
                def pose_feat(fused, prob):
                    pyi = jnp.clip((choose // S) // vs, 0, Sv - 1)
                    pxi = jnp.clip((choose % S) // vs, 0, Sv - 1)
                    idx = (pyi * Sv + pxi)[..., None] + d_offs
                    pts = flat_gather(fused.reshape(B, D * Sv * Sv, C), idx)
                    return (pts * prob[..., None].astype(pts.dtype)).sum(2)
                out.append(pose_feat(fused1, prob1).sum() +
                           pose_feat(fused2, prob2).sum())
            return sum(x.astype(jnp.float32) for x in out)
        return f

    names = ["psp x2 only", "+warp/fuse", "+nocs gathers", "+costreg x2",
             "+point depth", "+pose gather"]
    prev = 0.0
    for lv, name in enumerate(names):
        ms = scan_bench(stage(lv), img, iters=8, reps=2)
        print(f"L{lv} {name:16s}: {ms:8.2f} ms  (delta {ms - prev:+7.2f})",
              flush=True)
        prev = ms


if __name__ == "__main__":
    main()
