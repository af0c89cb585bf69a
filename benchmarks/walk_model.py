"""Host-side cost model for the MXU cluster-leaf traversal.

Simulates the block-synchronous cut-tree walk (traverse_pallas MXU path)
in numpy and reports, per wavefront type and block size, the number of
walk steps and cluster (matmul) visits per block. Hardware wall time is
then  steps * t_step + visits * t_visit  with the two constants measured
once on the chip — this lets CLUSTER_K / MXU_BLOCK be chosen without
burning TPU time (the axon chip wedges for hours on bad experiments).

Bounds instead of exact t-culling: the walk's per-lane t_best shrinkage
is bracketed by running the walk with t_best = +inf (no leaf shrinkage,
upper bound on visits) and t_best = final closest-hit t (oracle-tight,
lower bound). The true ordered walk lands between.

    python benchmarks/walk_model.py [--subdiv 4] [--blocks 1024 2048 4096]
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _wavefronts(scene, n, rng):
    lo = np.asarray(scene.bvh_min)[0]
    hi = np.asarray(scene.bvh_max)[0]
    center = 0.5 * (lo + hi)
    eye = center + np.asarray([0, 0.2, -2.8], np.float32)
    targets = rng.uniform(lo, hi, (n, 3)).astype(np.float32)
    d = targets - eye
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    coh = (np.broadcast_to(eye, (n, 3)).astype(np.float32), d)
    o2 = rng.uniform(lo, hi, (n, 3)).astype(np.float32)
    d2 = rng.normal(size=(n, 3)).astype(np.float32)
    d2 /= np.linalg.norm(d2, axis=1, keepdims=True)
    return {"coherent": coh, "incoherent": (o2, d2)}


def _sort_morton_octant(o, d, lo, hi):
    """Same coherence sort as scene.py's wavefront presort (host re-impl)."""
    q = np.clip((o - lo) / np.maximum(hi - lo, 1e-9), 0, 0.999)
    cell = (q * 32).astype(np.int64)  # 5 bits/axis

    def spread(x):
        x = (x | (x << 16)) & 0x030000FF
        x = (x | (x << 8)) & 0x0300F00F
        x = (x | (x << 4)) & 0x030C30C3
        x = (x | (x << 2)) & 0x09249249
        return x

    morton = (spread(cell[:, 0]) | (spread(cell[:, 1]) << 1)
              | (spread(cell[:, 2]) << 2))
    octant = ((d[:, 0] < 0).astype(np.int64)
              | ((d[:, 1] < 0).astype(np.int64) << 1)
              | ((d[:, 2] < 0).astype(np.int64) << 2))
    key = (morton << 3) | octant
    return np.argsort(key, kind="stable")


def walk_counts(scene, o, d, t_best, block):
    """(steps, cluster_visits) totals over all blocks of the wavefront."""
    nf = np.asarray(scene.mxu_node_f)
    link = np.asarray(scene.mxu_link)
    hit8 = link[:, :8]
    miss8 = link[:, 8:]
    slot = nf[:, 6].astype(np.int64)
    n = o.shape[0]
    inv = 1.0 / np.where(np.abs(d) < 1e-20, 1e-20, d)
    steps = visits = 0
    for b0 in range(0, n, block):
        sl = slice(b0, b0 + block)
        ob, ib, tb = o[sl], inv[sl], t_best[sl]
        octv = int(((ib[:, 0] < 0).mean() > 0.5)
                   | (int((ib[:, 1] < 0).mean() > 0.5) << 1)
                   | (int((ib[:, 2] < 0).mean() > 0.5) << 2))
        node = 0
        fuel = nf.shape[0] + 64
        while node >= 0 and fuel > 0:
            fuel -= 1
            steps += 1
            t0 = (nf[node, 0:3] - ob) * ib
            t1 = (nf[node, 3:6] - ob) * ib
            tmin = np.minimum(t0, t1).max(1)
            tmax = np.maximum(t0, t1).min(1)
            hit_any = bool(((tmin <= tmax) & (tmax > 0) & (tmin < tb)).any())
            is_cl = slot[node] >= 0
            if is_cl and hit_any:
                visits += 1
            node = int(miss8[node, octv] if (is_cl or not hit_any)
                       else hit8[node, octv])
    return steps, visits


def walk_counts_full(scene, o, d, t_best, block):
    """(steps, leaf_visits) of the SCALAR packet kernel's full-tree walk
    (traverse_pallas._closest_hit_kernel): same block-synchronous octant
    walk, but over the full octant-linked BVH with LEAF_K-prim leaves.
    Per-step cost = 2-3 scalar row loads + one slab test across the block;
    per leaf visit adds LEAF_K scalar prim-row streams + vector tests —
    so (steps, leaf_visits) against (t_step, t_leaf) calibrated once on
    hardware predicts the MI_PACKET_BLOCK sweep."""
    nmin = np.asarray(scene.bvh_min)
    nmax = np.asarray(scene.bvh_max)
    hit8 = np.asarray(scene.bvh_hit8).reshape(nmin.shape[0], 8)
    miss8 = np.asarray(scene.bvh_miss8).reshape(nmin.shape[0], 8)
    leaf_start = np.asarray(scene.bvh_leaf_start)
    n = o.shape[0]
    inv = 1.0 / np.where(np.abs(d) < 1e-20, 1e-20, d)
    steps = leaves = 0
    for b0 in range(0, n, block):
        sl = slice(b0, b0 + block)
        ob, ib, tb = o[sl], inv[sl], t_best[sl]
        octv = int(((ib[:, 0] < 0).mean() > 0.5)
                   | (int((ib[:, 1] < 0).mean() > 0.5) << 1)
                   | (int((ib[:, 2] < 0).mean() > 0.5) << 2))
        node = 0
        fuel = nmin.shape[0] + 64
        while node >= 0 and fuel > 0:
            fuel -= 1
            steps += 1
            t0 = (nmin[node] - ob) * ib
            t1 = (nmax[node] - ob) * ib
            tmin = np.minimum(t0, t1).max(1)
            tmax = np.maximum(t0, t1).min(1)
            hit_any = bool(((tmin <= tmax) & (tmax > 0) & (tmin < tb)).any())
            is_leaf = leaf_start[node] >= 0
            if is_leaf and hit_any:
                leaves += 1
            node = int(miss8[node, octv] if (is_leaf or not hit_any)
                       else hit8[node, octv])
    return steps, leaves


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--subdiv", type=int, default=4)
    ap.add_argument("--n", type=int, default=65536)
    ap.add_argument("--blocks", type=int, nargs="+",
                    default=[1024, 2048, 4096])
    ap.add_argument("--full-tree", action="store_true",
                    help="also model the scalar kernel's full-tree walk "
                         "(MI_PACKET_BLOCK sweep)")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    from mitsuba2_tpu.kernels import traverse_jnp
    from mitsuba2_tpu.scene.presets import mesh_gallery
    import jax.numpy as jnp

    scene = mesh_gallery(subdiv=args.subdiv)
    lo = np.asarray(scene.bvh_min)[0]
    hi = np.asarray(scene.bvh_max)[0]
    slot = np.asarray(scene.mxu_node_f)[:, 6]
    print(f"# {int(scene.n_prims)} prims, cut-tree rows "
          f"{slot.shape[0]}, clusters {int((slot >= 0).sum())}")
    rng = np.random.default_rng(0)
    for tag, (o, d) in _wavefronts(scene, args.n, rng).items():
        perm = _sort_morton_octant(o, d, lo, hi)
        o, d = o[perm], d[perm]
        t_true, _, _, _ = traverse_jnp.ray_intersect_preliminary(
            scene, jnp.asarray(o), jnp.asarray(d), jnp.inf)
        t_true = np.asarray(t_true)
        for block in args.blocks:
            nb = args.n // block
            for bound, tb in (("upper", np.full(args.n, np.inf, np.float32)),
                              ("lower", t_true)):
                steps, visits = walk_counts(scene, o, d, tb, block)
                print(f"{tag:10s} block={block:5d} {bound}: "
                      f"steps/block {steps/nb:7.1f}  "
                      f"visits/block {visits/nb:6.1f}  "
                      f"(x{block} rays)")
                if args.full_tree:
                    fsteps, fleaves = walk_counts_full(scene, o, d, tb, block)
                    print(f"{tag:10s} block={block:5d} {bound}: "
                          f"full-tree steps/block {fsteps/nb:7.1f}  "
                          f"leaf-visits/block {fleaves/nb:6.1f}")


if __name__ == "__main__":
    main()


def _collapse_bvh8(scene):
    """Collapse the BVH2 into BVH8 nodes (each BVH8 node = up to 8 BVH2
    descendants reached by expanding inner children breadth-first).
    Returns (children (M, 8) BVH2-node ids padded -1, n_bvh8_nodes) —
    enough structure for step counting; no layout/links needed."""
    import numpy as np
    ls = np.asarray(scene.bvh_leaf_start)
    miss = np.asarray(scene.bvh_miss)
    n = miss.shape[0]
    inner = ls < 0
    left = np.where(inner, np.arange(n) + 1, -1)
    right = np.where(inner, miss[np.minimum(np.maximum(left, 0), n - 1)], -1)

    nodes8 = []          # each: list of BVH2 ids (leaves of the collapse)
    node8_of = {}        # BVH2 id -> bvh8 node index owning it as a child
    stack = [0]
    while stack:
        root = stack.pop()
        # expand until 8 children: repeatedly split the child with the
        # largest subtree (approximated: any inner child, FIFO)
        kids = [root]
        while len(kids) < 8:
            # pick first inner child to expand
            for i, k in enumerate(kids):
                if inner[k]:
                    kids[i:i+1] = [int(left[k]), int(right[k])]
                    break
            else:
                break
        idx = len(nodes8)
        nodes8.append(kids)
        for k in kids:
            node8_of[k] = idx
            if inner[k]:
                stack.append(k)
    return nodes8


def bvh8_walk_counts(scene, o, d, t_best, block):
    """Block-synchronous BVH8 walk step count: one step = one BVH8 node
    visit (8 child slab tests + 8 scalar row loads). Children whose box
    the block hits AND that are inner BVH2 nodes push their BVH8 node.
    Leaf children count as leaf visits (prim tests unchanged in total).
    Upper bound only (no ordered t-culling across the 8 children)."""
    import numpy as np
    nmin = np.asarray(scene.bvh_min)
    nmax = np.asarray(scene.bvh_max)
    ls = np.asarray(scene.bvh_leaf_start)
    nodes8 = _collapse_bvh8(scene)
    # map BVH2 inner id -> bvh8 node that expands it
    expand = {}
    for i, kids in enumerate(nodes8):
        pass
    # build: bvh8 node for subtree rooted at BVH2 id r is the entry whose
    # construction started at r
    root_of = {}
    # reconstruct roots the same way _collapse_bvh8 assigns (first entry
    # root 0; every inner child k spawns a bvh8 node later). Simpler: map
    # by re-running the collapse bookkeeping.
    inner = ls < 0
    n = ls.shape[0]
    left = np.where(inner, np.arange(n) + 1, -1)
    miss = np.asarray(scene.bvh_miss)
    right = np.where(inner, miss[np.minimum(np.maximum(left, 0), n - 1)], -1)
    idx_of_root = {}
    stack = [0]
    order = []
    while stack:
        r = stack.pop()
        kids = [r]
        while len(kids) < 8:
            for i, k in enumerate(kids):
                if inner[k]:
                    kids[i:i+1] = [int(left[k]), int(right[k])]
                    break
            else:
                break
        idx_of_root[r] = len(order)
        order.append(kids)
        for k in kids:
            if inner[k]:
                stack.append(k)

    nrays = o.shape[0]
    inv = 1.0 / np.where(np.abs(d) < 1e-20, 1e-20, d)
    steps = leaf_visits = 0
    for b0 in range(0, nrays, block):
        sl = slice(b0, b0 + block)
        ob, ib, tb = o[sl], inv[sl], t_best[sl]
        work = [0]  # BVH2 roots of bvh8 nodes to visit
        while work:
            r = work.pop()
            steps += 1
            for k in order[idx_of_root[r]]:
                t0 = (nmin[k] - ob) * ib
                t1 = (nmax[k] - ob) * ib
                tmin = np.minimum(t0, t1).max(1)
                tmax = np.maximum(t0, t1).min(1)
                if not ((tmin <= tmax) & (tmax > 0) & (tmin < tb)).any():
                    continue
                if inner[k]:
                    work.append(k)
                else:
                    leaf_visits += 1
    return steps, leaf_visits


def bvh8_kernel_iters(scene, o, d, t_best, block):
    """EXACT iteration count of the BVH8 Pallas kernel's while_loop
    (one iteration = fresh-mask OR advance-one-child OR pop), for
    calibrating hardware wall time: t = iters * t_iter with t_iter
    measured once on chip. Uses the same tables the kernel walks."""
    import numpy as np
    cf = np.asarray(scene.bvh8_child)
    o8 = np.asarray(scene.bvh8_order)
    nrays = o.shape[0]
    inv = 1.0 / np.where(np.abs(d) < 1e-20, 1e-20, d)
    iters = 0
    for b0 in range(0, nrays, block):
        sl = slice(b0, b0 + block)
        ob, ib, tb = o[sl], inv[sl], t_best[sl]
        octv = int((ib[:, 0] < 0).mean() > 0.5) \
            | (int((ib[:, 1] < 0).mean() > 0.5) << 1) \
            | (int((ib[:, 2] < 0).mean() > 0.5) << 2)

        def slab(row):
            t0 = (row[0:3] - ob) * ib
            t1 = (row[3:6] - ob) * ib
            tmin = np.minimum(t0, t1).max(1)
            tmax = np.maximum(t0, t1).min(1)
            return ((tmin <= tmax) & (tmax > 0) & (tmin < tb)).any()

        cur, mask, fresh, stack = 0, 0, True, []
        while cur >= 0:
            iters += 1
            ordr = o8[cur * 8 + octv]
            if fresh:
                mask = 0
                for j in range(8):
                    row = cf[cur * 8 + ordr[j]]
                    if row[6] != -1.0 and slab(row):
                        mask |= 1 << j
                fresh = False
            if mask == 0:
                if stack:
                    cur, mask = stack.pop()
                else:
                    cur = -1
                continue
            j = (mask & -mask).bit_length() - 1
            mask &= ~(1 << j)
            row = cf[cur * 8 + ordr[j]]
            if not slab(row):
                continue
            if row[6] >= 0:
                continue  # leaf: prim tests happen in this iteration
            if mask:   # kernel skips pushing exhausted parents
                stack.append((cur, mask))
            cur = -2 - int(row[6])
            fresh = True
    return iters
