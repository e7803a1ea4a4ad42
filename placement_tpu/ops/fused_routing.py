"""Row-layout routing-reward bodies for the fused Pallas rollout kernel.

The kernel (ops/fused_rollout.py) keeps every per-board quantity as a row of
a ``[B, F]`` array, so the terminal routing reward must be expressed as
lane-parallel column arithmetic — no gathers, no sorts, no data-dependent
shapes. This module holds those reward bodies as plain-jnp functions over
``[B, P]`` pin tables so the unit tests can compare them one-to-one against
the reference-parity ``routing`` module outside the kernel (and the Pallas
interpreter exercises them verbatim inside it):

  * ``centroid_wl_int``  — centroid star routing
    (route_pins_centroid, dummy_env_rectangular_pin.py:1296-1324)
  * ``beam_wl_int``      — heapq-order-faithful beam-search routing
    (beam_search:1356-1423 / route_pins_beam_search:1425-1476), replicating
    ``routing.beam_search_net``'s ordering exactly: stable nearest-neighbour
    expansion, (cost, lexicographic-path) candidate ranking, first-wins ties
  * ``reward_rows``      — reward composition for all three reward types
    (find_reward:832-975; "both" takes the route with fewer crossings,
    tie -> beam, :951-965)

All arithmetic mirrors ``routing.py`` operation-for-operation (same
formulas, same accumulation order) so results agree bit-for-bit in f32:
coordinates are small integers, squared distances are exact, sqrt is
correctly rounded, and the crossing predicate is exact integer arithmetic.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from placement_tpu.env.types import EnvParams

F32 = jnp.float32
I32 = jnp.int32
BIG = 1e9          # dead-path cost, routing.BIG
INF2 = 2e9         # "already selected" marker, must exceed BIG
COORD_BASE = float(1 << 15)  # routing._COORD_BASE (point keys exact in f32)


def _iota_p(B: int, P: int):
    return jax.lax.broadcasted_iota(I32, (B, P), 1)


def _net_arrays(params: EnvParams, pax, pay, pnet, npin):
    """Split the net-grouped pin table into per-net [B, M] rank arrays.

    Returns ``(xs, ys, present, cnt)`` lists over nets: ``xs[n][:, j]`` is
    the f32 x of net ``n``'s j-th pin (table order — the reference's
    net-grouped ``self.pins`` order, dummy_env_rectangular_pin.py:1167-1169),
    ``present[n]`` bool[B, M] validity, ``cnt[n]`` i32[B, 1] pin count.
    """
    B, P = pax.shape
    N, M = params.max_num_nets, params.max_num_pins_per_net
    iota = _iota_p(B, P)
    iota_m = jax.lax.broadcasted_iota(I32, (B, M), 1)
    in_use = iota < npin
    x = pax.astype(F32)
    y = pay.astype(F32)

    xs, ys, present, cnt = [], [], [], []
    start = jnp.zeros((B, 1), I32)
    for n in range(N):
        mn = (pnet == n) & in_use
        c = jnp.sum(mn.astype(I32), axis=1, keepdims=True)
        rin = iota - start
        xn = [jnp.sum(jnp.where(mn & (rin == j), x, 0.0),
                      axis=1, keepdims=True) for j in range(M)]
        yn = [jnp.sum(jnp.where(mn & (rin == j), y, 0.0),
                      axis=1, keepdims=True) for j in range(M)]
        xs.append(jnp.concatenate(xn, axis=1))
        ys.append(jnp.concatenate(yn, axis=1))
        present.append(iota_m < c)
        cnt.append(c)
        start = start + c
    return xs, ys, present, cnt


# ---------------------------------------------------------------------------
# Centroid routing (route_pins_centroid:1296-1324) on row tables
# ---------------------------------------------------------------------------

def centroid_wl_int(params: EnvParams, pax, pay, pnet, npin
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Centroid-route wirelength and crossing count, ``([B,1] f32) * 2``.

    Identical construction to ``routing.centroid_route`` +
    ``count_crossings`` + ``wirelength``: a net with exactly two pins routes
    pin0 -> pin1 directly, otherwise every pin connects to the net centroid;
    the crossing predicate runs on integer-scaled coordinates (pin * count,
    centroid as the raw coordinate sum) so it is exact arithmetic.
    """
    B, P = pax.shape
    N = params.max_num_nets
    iota = _iota_p(B, P)

    x = pax.astype(F32)
    y = pay.astype(F32)
    in_use = iota < npin
    cnt_n, cx_n, cy_n, sx_n, sy_n, start_n = [], [], [], [], [], []
    run = jnp.zeros((B, 1), I32)
    for n in range(N):
        mn = (pnet == n) & in_use
        c = jnp.sum(mn.astype(I32), axis=1, keepdims=True)
        denom = jnp.maximum(c, 1).astype(F32)
        sx = jnp.sum(jnp.where(mn, x, 0.0), axis=1, keepdims=True)
        sy = jnp.sum(jnp.where(mn, y, 0.0), axis=1, keepdims=True)
        cnt_n.append(c)
        sx_n.append(sx)
        sy_n.append(sy)
        cx_n.append(sx / denom)
        cy_n.append(sy / denom)
        start_n.append(run)
        run = run + c
    # per-pin segment pin -> centroid; 2-pin nets route pin0 -> pin1 in
    # slot 0 only. Real endpoints (x2, y2) feed wirelength; integer-scaled
    # ones (x2s/y2s = coordinate sums, x1s/y1s = pin * count, scale s) feed
    # the exact crossing predicate (see routing._pairwise_intersect).
    x2 = jnp.zeros((B, P), F32)
    y2 = jnp.zeros((B, P), F32)
    x2s = jnp.zeros((B, P), F32)
    y2s = jnp.zeros((B, P), F32)
    s = jnp.ones((B, P), F32)
    svalid = jnp.zeros((B, P), jnp.bool_)
    for n in range(N):
        mn = (pnet == n) & in_use
        rin = iota - start_n[n]
        two = cnt_n[n] == 2
        first = mn & (rin == 0)
        second = mn & (rin == 1)
        xs = jnp.sum(jnp.where(second, x, 0.0), axis=1, keepdims=True)
        ys = jnp.sum(jnp.where(second, y, 0.0), axis=1, keepdims=True)
        ex = jnp.where(two, xs, cx_n[n])
        ey = jnp.where(two, ys, cy_n[n])
        exs = jnp.where(two, xs, sx_n[n])
        eys = jnp.where(two, ys, sy_n[n])
        sc = jnp.where(two, 1.0, jnp.maximum(cnt_n[n], 1).astype(F32))
        x2 = jnp.where(mn, jnp.broadcast_to(ex, (B, P)), x2)
        y2 = jnp.where(mn, jnp.broadcast_to(ey, (B, P)), y2)
        x2s = jnp.where(mn, jnp.broadcast_to(exs, (B, P)), x2s)
        y2s = jnp.where(mn, jnp.broadcast_to(eys, (B, P)), y2s)
        s = jnp.where(mn, jnp.broadcast_to(sc, (B, P)), s)
        sv = mn & ~(jnp.broadcast_to(two, (B, P)) & ~first)
        svalid = svalid | sv
    wl = jnp.sum(jnp.where(
        svalid, jnp.sqrt((x - x2) ** 2 + (y - y2) ** 2), 0.0),
        axis=1, keepdims=True)
    x1s = x * s
    y1s = y * s

    # all-pairs cross-net crossings (find_num_intersection:663;
    # is_intersect:687): shared endpoint counts, parallel never counts,
    # otherwise orientation sign tests; pair (p, q) brought to the common
    # integer frame s_p * s_q.
    ints = jnp.zeros((B, 1), F32)
    for p in range(P):
        sp = s[:, p:p + 1]
        ax1 = x1s[:, p:p + 1] * s
        ay1 = y1s[:, p:p + 1] * s
        ax2 = x2s[:, p:p + 1] * s
        ay2 = y2s[:, p:p + 1] * s
        bx1 = x1s * sp
        by1 = y1s * sp
        bx2 = x2s * sp
        by2 = y2s * sp
        later = iota > p
        ok = (svalid & later & (pnet != pnet[:, p:p + 1])
              & svalid[:, p:p + 1])
        hit = _seg_intersect(ax1, ay1, ax2, ay2, bx1, by1, bx2, by2)
        ints = ints + jnp.sum((hit & ok).astype(F32), axis=1, keepdims=True)
    return wl, ints


def _seg_intersect(ax1, ay1, ax2, ay2, bx1, by1, bx2, by2):
    """is_intersect (dummy_env_rectangular_pin.py:687-739) as orientation
    sign tests on (integer-valued) f32 coordinates — exact arithmetic."""
    same = (((ax1 == bx1) & (ay1 == by1))
            | ((ax1 == bx2) & (ay1 == by2))
            | ((ax2 == bx1) & (ay2 == by1))
            | ((ax2 == bx2) & (ay2 == by2)))
    det = (ax1 - ax2) * (by1 - by2) - (ay1 - ay2) * (bx1 - bx2)
    o1 = (ax2 - ax1) * (by1 - ay1) - (ay2 - ay1) * (bx1 - ax1)
    o2 = (ax2 - ax1) * (by2 - ay1) - (ay2 - ay1) * (bx2 - ax1)
    o3 = (bx2 - bx1) * (ay1 - by1) - (by2 - by1) * (ax1 - bx1)
    o4 = (bx2 - bx1) * (ay2 - by1) - (by2 - by1) * (ax2 - bx1)
    opp_b = ((o1 >= 0) & (o2 <= 0)) | ((o1 <= 0) & (o2 >= 0))
    opp_a = ((o3 >= 0) & (o4 <= 0)) | ((o3 <= 0) & (o4 >= 0))
    return same | ((det != 0) & opp_b & opp_a)


# ---------------------------------------------------------------------------
# Beam-search routing (beam_search:1356-1423) on row tables
# ---------------------------------------------------------------------------

def _first_where(cond, iota_m, M):
    """Lowest lane index where ``cond`` holds (M if none) — [B,1] i32.
    Replicates argsort/argmax first-wins tie-breaking."""
    return jnp.min(jnp.where(cond, iota_m, M), axis=1, keepdims=True)


def _at(arr, idx, iota_m):
    """arr[b, idx[b]] as a [B,1] column (idx < M; 0.0 if idx == M)."""
    return jnp.sum(jnp.where(iota_m == idx, arr, 0.0), axis=1, keepdims=True)


def _colsel(cond, a, b):
    """``jnp.where`` for a ``[B, 1]`` bool condition over wider operands.

    Mosaic cannot lower a lane-broadcast select on i1 vectors (the same
    class the f32 ``vis`` mask works around), so re-materialize the
    condition at the operands' full shape via an f32 broadcast before
    selecting. Value-identical to ``jnp.where(cond, a, b)``.
    """
    shape = jnp.broadcast_shapes(a.shape, b.shape)
    if shape == cond.shape:
        return jnp.where(cond, a, b)
    m = jnp.broadcast_to(cond.astype(F32), shape)
    return jnp.where(m > 0.0, a, b)


def _lex_less(cost_a, pk_a, cost_b, pk_b, iota_m, M):
    """Heap ordering (routing._heap_order): (cost, path point keys
    lexicographically from position 0). Strict less — equal candidates
    compare False, so iteration order supplies lexsort's stability."""
    diff = pk_a != pk_b
    pos = _first_where(diff, iota_m, M)
    va = jnp.sum(jnp.where(iota_m == pos, pk_a, 0.0), axis=1, keepdims=True)
    vb = jnp.sum(jnp.where(iota_m == pos, pk_b, 0.0), axis=1, keepdims=True)
    lt = (pos < M) & (va < vb)
    return (cost_a < cost_b) | ((cost_a == cost_b) & lt)


def _beam_net(xs, ys, present, cnt, bw: int, M: int):
    """Beam-search path for one net -> position arrays ``(px, py)`` f32[B,M].

    Consecutive path positions are the route segments, valid while
    ``t + 1 <= cnt - 1``. Replicates ``routing.beam_search_net`` +
    ``pin_outlier_index`` exactly: same distance formulas, stable
    nearest-neighbour order, (cost, lexicographic path) candidate ranking,
    first-wins ties, per-board freezing after ``cnt - 1`` expansions. The
    rounds run under ``fori_loop`` (pins live on lanes, so every round is a
    handful of lane-parallel ops — and the graph stays small enough for
    XLA:CPU to compile the interpreter-mode tests quickly).
    """
    B = cnt.shape[0]
    iota_m = jax.lax.broadcasted_iota(I32, (B, M), 1)

    # start = pin farthest from the net centroid (pin_outlier:1326;
    # np.argmax -> first max wins ties)
    denom = jnp.maximum(cnt, 1).astype(F32)
    cx = jnp.sum(jnp.where(present, xs, 0.0), axis=1, keepdims=True) / denom
    cy = jnp.sum(jnp.where(present, ys, 0.0), axis=1, keepdims=True) / denom
    d0 = jnp.where(present,
                   jnp.sqrt((xs - cx) ** 2 + (ys - cy) ** 2), -1.0)
    dmax = jnp.max(d0, axis=1, keepdims=True)
    start = _first_where(d0 == dmax, iota_m, M)
    sx = _at(xs, start, iota_m)
    sy = _at(ys, start, iota_m)
    skey = sx * COORD_BASE + sy

    at0 = iota_m == 0
    cost = tuple(jnp.full((B, 1), 0.0 if k == 0 else BIG, F32)
                 for k in range(bw))
    curx = (sx,) * bw
    cury = (sy,) * bw
    # vis is a f32 0/1 mask, not bool: Mosaic cannot lower a
    # sublane-broadcast select on i1 vectors (trunci i8->i1)
    vis = (((iota_m == start) | ~present).astype(F32),) * bw
    pk = (jnp.where(at0, skey, -1.0),) * bw
    px = (jnp.where(at0, sx, 0.0),) * bw
    py = (jnp.where(at0, sy, 0.0),) * bw

    def round_(step, carry):
        cost, curx, cury, vis, pk, px, py = carry
        at_new = iota_m == step + 1
        # candidates: parent-major, nearest-neighbour-minor — the exact
        # candidate index order of beam_search_net's reshape, so first-wins
        # selection below reproduces lexsort's stability.
        cand = []
        for k in range(bw):
            d = jnp.where(vis[k] > 0.0, BIG,
                          jnp.sqrt((xs - curx[k]) ** 2
                                   + (ys - cury[k]) ** 2))
            # f32 0/1 mask like `vis` (i1 vector selects don't lower)
            taken = jnp.zeros((B, M), F32)
            for _c in range(bw):
                eff = jnp.where(taken > 0.0, INF2, d)
                m = jnp.min(eff, axis=1, keepdims=True)
                j = _first_where(eff == m, iota_m, M)
                taken = jnp.maximum(taken, (iota_m == j).astype(F32))
                nx = _at(xs, j, iota_m)
                ny = _at(ys, j, iota_m)
                ccost = cost[k] + jnp.where(m >= INF2, BIG, m)
                ccost = jnp.where(ccost >= BIG, BIG, ccost)
                nkey = nx * COORD_BASE + ny
                cand.append(dict(
                    cost=ccost,
                    pk=jnp.where(at_new, nkey, pk[k]),
                    px=jnp.where(at_new, nx, px[k]),
                    py=jnp.where(at_new, ny, py[k]),
                    vis=jnp.maximum(vis[k], (iota_m == j).astype(F32)),
                    cx=nx, cy=ny))

        # keep the bw best candidates in heap order (first-wins ties)
        active = (step + 1) <= (cnt - 1)
        ctaken = [jnp.zeros((B, 1), bool) for _ in cand]
        ncost, ncurx, ncury = list(cost), list(curx), list(cury)
        nvis, npk, npx, npy = list(vis), list(pk), list(px), list(py)
        for k in range(bw):
            sel = dict(cost=jnp.full((B, 1), INF2, F32),
                       pk=jnp.zeros((B, M), F32),
                       px=jnp.zeros((B, M), F32),
                       py=jnp.zeros((B, M), F32),
                       vis=jnp.zeros((B, M), F32),
                       cx=jnp.zeros((B, 1), F32),
                       cy=jnp.zeros((B, 1), F32))
            sel_i = jnp.full((B, 1), -1, I32)
            seen = jnp.zeros((B, 1), bool)
            for i, c in enumerate(cand):
                take = ~ctaken[i] & (
                    ~seen | _lex_less(c["cost"], c["pk"],
                                      sel["cost"], sel["pk"], iota_m, M))
                sel = {f: _colsel(take, c[f], sel[f]) for f in sel}
                sel_i = jnp.where(take, i, sel_i)
                seen = seen | ~ctaken[i]
            for i in range(len(cand)):
                ctaken[i] = ctaken[i] | (sel_i == i)
            # freeze finished boards (count-1 expansions done)
            ncost[k] = jnp.where(active, sel["cost"], cost[k])
            npk[k] = _colsel(active, sel["pk"], pk[k])
            npx[k] = _colsel(active, sel["px"], px[k])
            npy[k] = _colsel(active, sel["py"], py[k])
            nvis[k] = _colsel(active, sel["vis"], vis[k])
            ncurx[k] = jnp.where(active, sel["cx"], curx[k])
            ncury[k] = jnp.where(active, sel["cy"], cury[k])
        return (tuple(ncost), tuple(ncurx), tuple(ncury), tuple(nvis),
                tuple(npk), tuple(npx), tuple(npy))

    cost, curx, cury, vis, pk, px, py = jax.lax.fori_loop(
        0, M - 1, round_, (cost, curx, cury, vis, pk, px, py))

    # final heap pop: min (cost, lexicographic path), first wins
    bcost, bkeys, bx, by = cost[0], pk[0], px[0], py[0]
    for k in range(1, bw):
        better = _lex_less(cost[k], pk[k], bcost, bkeys, iota_m, M)
        bcost = jnp.where(better, cost[k], bcost)
        bkeys = _colsel(better, pk[k], bkeys)
        bx = _colsel(better, px[k], bx)
        by = _colsel(better, py[k], by)
    return bx, by


def beam_wl_int(params: EnvParams, pax, pay, pnet, npin
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Beam-route wirelength and crossing count, ``([B,1] f32) * 2``.

    Matches ``routing.beam_route`` + ``count_crossings`` + ``wirelength``
    (route_pins_beam_search:1425-1476): every net (including 2-pin nets) is
    routed by beam search from its outlier pin; segments are consecutive
    path positions, ``cnt - 1`` per net. Beam endpoints are raw integer pin
    coordinates, so the crossing predicate is exact with no scaling.
    """
    B, P = pax.shape
    N, M = params.max_num_nets, params.max_num_pins_per_net
    bw = int(params.reward_beam_width)
    xs, ys, present, cnt = _net_arrays(params, pax, pay, pnet, npin)
    iota_m = jax.lax.broadcasted_iota(I32, (B, M), 1)

    seg = []   # per net: (x[t], y[t] [B,1] lists of length M, valid[t])
    wl = jnp.zeros((B, 1), F32)
    for n in range(N):
        bx, by = _beam_net(xs[n], ys[n], present[n], cnt[n], bw, M)
        pxs = [jnp.sum(jnp.where(iota_m == t, bx, 0.0),
                       axis=1, keepdims=True) for t in range(M)]
        pys = [jnp.sum(jnp.where(iota_m == t, by, 0.0),
                       axis=1, keepdims=True) for t in range(M)]
        sv = [jnp.full((B, 1), t + 1) <= (cnt[n] - 1) for t in range(M - 1)]
        seg.append((pxs, pys, sv))
        for t in range(M - 1):
            wl = wl + jnp.where(
                sv[t],
                jnp.sqrt((pxs[t] - pxs[t + 1]) ** 2
                         + (pys[t] - pys[t + 1]) ** 2),
                0.0)

    ints = jnp.zeros((B, 1), F32)
    for n1 in range(N):
        ax, ay, av = seg[n1]
        for n2 in range(n1 + 1, N):
            bx, by, bv = seg[n2]
            for t1 in range(M - 1):
                for t2 in range(M - 1):
                    hit = _seg_intersect(
                        ax[t1], ay[t1], ax[t1 + 1], ay[t1 + 1],
                        bx[t2], by[t2], bx[t2 + 1], by[t2 + 1])
                    ints = ints + (hit & av[t1] & bv[t2]).astype(F32)
    return wl, ints


# ---------------------------------------------------------------------------
# Reward composition (find_reward:832-975)
# ---------------------------------------------------------------------------

def reward_rows(params: EnvParams, pax, pay, pnet, npin) -> jnp.ndarray:
    """Routed terminal reward ``f32[B, 1]`` for any reward type.

    ``both`` takes the route with fewer crossings, tie -> beam
    (find_reward:951-965). The worst-case penalty branch lives in the
    kernel (reward_rows is only evaluated on placed-all episode ends).
    """
    if params.reward_type in ("centroid", "both"):
        c_wl, c_int = centroid_wl_int(params, pax, pay, pnet, npin)
    if params.reward_type in ("beam", "both"):
        b_wl, b_int = beam_wl_int(params, pax, pay, pnet, npin)

    if params.reward_type == "centroid":
        wl, ints = c_wl, c_int
    elif params.reward_type == "beam":
        wl, ints = b_wl, b_int
    else:
        use_beam = b_int <= c_int
        wl = jnp.where(use_beam, b_wl, c_wl)
        ints = jnp.where(use_beam, b_int, c_int)

    return -(F32(float(params.weight_wirelength))
             * (wl / F32(float(params.wirelength_normalizer)))
             + F32(float(params.weight_num_intersections))
             * (ints / F32(float(params.intersections_normalizer))))
