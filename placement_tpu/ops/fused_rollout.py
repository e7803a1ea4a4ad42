"""Single-kernel Pallas rollout for the pin environment.

The vmapped `core.step_autoreset` path lowers to ~50 small XLA kernels per
env step (mask SAT, action sampling, pin updates, and — dominating at 75% of
step cost, PERF_NOTES.md — the fresh-instance generator that runs every step
because `vmap` turns the done-branch into a `select`).  This module collapses
the *entire* rollout chunk into ONE Pallas kernel: random legal-action
sampling, the placement transition, the routing reward (find_reward,
dummy_env_rectangular_pin.py:832-975 — centroid, beam, or "both", see
ops/fused_routing.py), and in-kernel instance regeneration
(generate_instances:1006) on episode end, looped over `num_steps` with
`fori_loop`.

Layout: boards on sublanes.  Every per-board quantity is a row of a
`[block, F]` array (grid flattened to `[block, H*W]`, pin tables
`[block, P]`, scalars `[block, 1]`), so each operation is one lane-parallel
VPU op over the whole block and the hot rectangle-sum reduction becomes a
single `[block, A] @ [A, A]` MXU matmul per (h, w) footprint.

Supported configurations (trace-time checked): all four env variants —
PIN/PIN_SPATIAL with any reward type (centroid / beam / both), and
SQUARE/RECT with their dense +1-per-placement reward (the pin/net
machinery and the routing reward body are skipped at trace time; the
orientation sampler covers 1, 2, or 4 planes). Out-of-envelope configs
fall back to the pure-JAX `pooled` path.  RNG is a counter-based hash PRNG (`_Rng`) — a
different stream than the JAX path but the same distributions, identical on
TPU and under the CPU interpreter; the build owns its seed story (SURVEY.md
§7 hard-part #1), and tests/tooling/test_fused_rollout.py checks
distributional agreement against the pure-JAX stepper.

Semantics notes (vs. core.step / generator.generate_instance):
  * `pin_local` / observation scatter metadata are not maintained — this is
    the throughput rollout path (random policy, no observations).
  * The per-net pin->component multinomial matches generator.py's vectorized
    scheme (one uncapped round + capacity clip + deterministic water-fill),
    which itself equals the reference's redraw loop whenever no cap binds.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from placement_tpu.env.types import EnvParams, Variant
from placement_tpu.ops import fused_routing

F32 = jnp.float32
I32 = jnp.int32


#: Size envelope for the fused kernel (see ``envelope_report``). The kernel
#: unrolls trace-time loops and holds [A, A] cover matrices in VMEM, so cost
#: scales super-linearly in several dimensions; beyond these limits it would
#: hit VMEM/compile-time walls deep inside Mosaic instead of failing cleanly.
#: Limits carry ~1.5-2x headroom over the largest hardware-validated configs
#: (flagship A=100/C=5/P=18; parity A=100/C=6/P=20/8 footprints).
ENVELOPE = {
    "area": 144,          # [A, A] covers/tri matrices + [block, A] rows
    "footprints": 12,     # one [A, A] matrix + matmul per (h, w) combo
    "components": 8,      # O(C^2) sorting network per net, O(P*C) rank loops
    "pins": 48,           # O(P^2) crossing pairs unrolled at trace time
    "pins_per_component": 16,   # PPC^2 cell-permutation network, x C
    "beam_width": 4,      # bw^2 candidates per beam round, each lex-compared
    "components_nopin": 64,     # SQUARE/RECT: components only feed O(C)
                                # lane selects (no per-net sorting network)
    "vmem_bytes": 12 * 2**20,   # coarse working-set estimate at block=128
}


def _footprints(params: EnvParams):
    combos = {(h, w)
              for h in range(params.min_component_h,
                             params.max_component_h + 1)
              for w in range(params.min_component_w,
                             params.max_component_w + 1)}
    return sorted(combos | {(w, h) for (h, w) in combos})


def envelope_report(params: EnvParams, block: int = 128,
                    vmem_limit_bytes: int = None) -> "tuple[bool, list]":
    """Check ``params`` against the fused kernel's size envelope.

    Returns ``(ok, reasons)`` where ``reasons`` lists every violated limit.
    The envelope exists because the kernel's cost drivers are trace-time:
    a web-app-maximum config (30x30 grid, 40 components, 10 nets x 10 pins)
    would build 900x900 cover matrices and unroll ~10k crossing-pair tests,
    blowing VMEM and compile time — it must be rejected here, before
    ``pallas_call``, so callers fall back to the pooled pure-JAX path.

    ``vmem_limit_bytes`` (when the caller raises Mosaic's scoped-VMEM
    budget) replaces the default VMEM cap in the estimate check.
    """
    reasons = []
    a, c, p = params.area, params.max_components, params.max_pins
    ppc = params.max_num_pins_per_component
    if params.variant == Variant.SQUARE:
        nf = 1
    else:
        nf = len(_footprints(params))
    bw = int(params.reward_beam_width)
    if params.has_pins:
        # pin variants: the per-net allocator is an O(C^2) sorting network
        # and the crossing count unrolls O(P^2) pairs — all trace-time
        checks = [
            ("area", a), ("footprints", nf), ("components", c), ("pins", p),
            ("pins_per_component", ppc),
        ]
        if params.reward_type in ("beam", "both"):
            checks.append(("beam_width", bw))
    else:
        # SQUARE/RECT: no nets/pins machinery; components only feed cheap
        # O(C) lane selects, so the limit is looser
        checks = [("area", a), ("footprints", nf),
                  ("components_nopin", c)]
    for name, value in checks:
        if value > ENVELOPE[name]:
            reasons.append(f"{name}={value} > {ENVELOPE[name]}")
    # VMEM estimate: cover/tri matrices + the per-block row working set.
    # The x30 row multiplier is CALIBRATED against Mosaic's measured
    # allocation for the flagship config (block=256 overflows the 16 MB
    # scoped budget by ~1.5 MB -> ~68 KB/board vs ~2.4 KB of raw carry
    # rows; the unrolled body keeps many intermediates live).
    budget = vmem_limit_bytes or ENVELOPE["vmem_bytes"]
    vmem = 4 * ((nf + 1) * a * a
                + 30 * block * (4 * a + 9 * p + 2 * c + c * ppc))
    if vmem > budget:
        reasons.append(f"vmem_estimate={vmem} > {budget}")
    return not reasons, reasons


def supports(params: EnvParams, block: int = 128) -> bool:
    """Whether the fused kernel covers this configuration.

    PIN_SPATIAL shares the PIN dynamics and reward exactly (the reference
    files are ~95% line-identical; only the observation builders differ,
    dummy_env_rectangular_pin_spatial.py:1663-1698) and this rollout path
    materializes no observations, so both pin variants run the same kernel.
    SQUARE and RECT run a reduced kernel (no pin machinery, dense +1
    reward) under looser limits (``components_nopin``). Configurations
    outside ``ENVELOPE`` return False (see ``envelope_report``) and
    callers fall back to ``env.pooled``.

    ``block`` must match the block size the caller will pass to
    ``make_fused_rollout`` (the VMEM estimate scales with it) — the
    default matches the benchmark's block.

    Calibration scope: the VMEM estimate's x30 live-row multiplier was
    measured against Mosaic's actual allocation for the flagship config
    (see ``envelope_report``); an in-envelope config with a very different
    shape mix could in principle still overflow the scoped budget inside
    Mosaic. Callers that must not crash on such a config should wrap the
    first invocation in try/except and fall back to ``env.pooled``
    (``bench.py`` does exactly this).
    """
    ok, _ = envelope_report(params, block=block)
    return ok


# ---------------------------------------------------------------------------
# Small in-kernel helpers (all shapes static; boards on sublanes)
# ---------------------------------------------------------------------------

def _lane_gather(table, idx, table_width: int):
    """out[b, q] = table[b, idx[b, q]] for small static table widths.

    Lane-varying gathers don't lower on TPU; a sum of `table_width` selects
    does, and table widths here are <= max_nets * max_pins_per_net.
    """
    out = jnp.zeros(idx.shape, table.dtype)
    for j in range(table_width):
        out = jnp.where(idx == j, table[:, j:j + 1], out)
    return out


U32 = jnp.uint32


def _mix(x):
    """lowbias32 avalanche mix (u32 -> u32)."""
    x = x ^ (x >> U32(16))
    x = x * U32(0x7feb352d)
    x = x ^ (x >> U32(15))
    x = x * U32(0x846ca68b)
    x = x ^ (x >> U32(16))
    return x


class _Rng:
    """Counter-based stateless PRNG: two lowbias32 rounds over
    (salt, static call index, element index).

    Used instead of `pltpu.prng_random_bits` so the SAME bit-stream runs on
    real TPUs and under the Pallas interpreter on CPU (the interpreter's
    hardware-PRNG stub returns zeros) — the test-suite exercises exactly the
    kernel the benchmark runs.  `salt` is a traced u32 scalar mixing the
    chunk seed, block id, and step index; because the BLOCK id is in the
    salt, the sampled streams are a function of (seed, block size): the
    same seed at the same block size is bit-reproducible (what the
    hardware goldens pin), while a different block size draws a
    different, equally-valid sample stream (verified on chip: block
    128 vs 256 runs agree on aggregate done-counts within sampling
    noise but sample different episodes). The call counter is advanced at
    trace time, so every `uniform()` call site draws an independent stream.
    """

    def __init__(self, salt):
        self.salt = _mix(salt)
        self.n = 0

    def bits(self, shape):
        self.n += 1
        call = U32((self.n * 2654435761) & 0xFFFFFFFF)
        idx = (jax.lax.broadcasted_iota(I32, shape, 0).astype(U32)
               * U32(shape[1])
               + jax.lax.broadcasted_iota(I32, shape, 1).astype(U32))
        return _mix(idx ^ _mix(call ^ self.salt))

    def uniform(self, shape):
        """f32 uniforms in [0, 1)."""
        # top 24 bits; reinterpret as i32 (value < 2^24, so sign-safe) since
        # Mosaic has no u32->f32 cast
        top = pltpu.bitcast(self.bits(shape) >> U32(8), I32)
        return top.astype(F32) * F32(1.0 / (1 << 24))

    def randint(self, lo, hi, shape):
        """Uniform ints in [lo, hi] (host ints or [B,1] arrays)."""
        u = self.uniform(shape)
        span = hi - lo + 1
        span_f = F32(span) if isinstance(span, int) else span.astype(F32)
        draw = jnp.floor(u * span_f).astype(I32)
        return lo + jnp.minimum(draw, span - 1)


def _cumsum_cols(cols):
    """Inclusive cumsum over a python list of [B,1] columns."""
    out = []
    acc = jnp.zeros_like(cols[0])
    for c in cols:
        acc = acc + c
        out.append(acc)
    return out


def centroid_reward_rows(params: EnvParams, pax, pay, pnet,
                         npin) -> jnp.ndarray:
    """Centroid routing reward on row-layout tables (f32[B, 1]).

    Thin wrapper over ``fused_routing.centroid_wl_int`` kept for test/API
    compatibility; the kernel itself dispatches through
    ``fused_routing.reward_rows`` which also covers beam/"both"
    (find_reward:832-975).
    """
    wl, ints = fused_routing.centroid_wl_int(params, pax, pay, pnet, npin)
    return -(F32(float(params.weight_wirelength))
             * (wl / F32(float(params.wirelength_normalizer)))
             + F32(float(params.weight_num_intersections))
             * (ints / F32(float(params.intersections_normalizer))))


def _sort_desc_cols(key_cols, payload_cols_list):
    """Bubble sorting network, descending by key; payloads ride along.

    `key_cols` is a python list of [B,1] arrays; `payload_cols_list` a list
    of such lists. Static O(C^2) compare-exchanges — fine for C <= ~8.
    """
    n = len(key_cols)
    keys = list(key_cols)
    pays = [list(p) for p in payload_cols_list]
    for r in range(n):
        for i in range(n - 1 - r):
            swap = keys[i] < keys[i + 1]
            ki, kj = keys[i], keys[i + 1]
            keys[i] = jnp.where(swap, kj, ki)
            keys[i + 1] = jnp.where(swap, ki, kj)
            for p in pays:
                pi, pj = p[i], p[i + 1]
                p[i] = jnp.where(swap, pj, pi)
                p[i + 1] = jnp.where(swap, pi, pj)
    return keys, pays


# ---------------------------------------------------------------------------
# Kernel factory
# ---------------------------------------------------------------------------

def _build_kernel(params: EnvParams, num_steps: int, block: int):  # noqa: complexity
    H, W, A = params.height, params.width, params.area
    C = params.max_components
    N = params.max_num_nets
    M = params.max_num_pins_per_net
    P = params.max_pins
    PPC = params.max_num_pins_per_component
    minH, maxH = params.min_component_h, params.max_component_h
    minW, maxW = params.min_component_w, params.max_component_w
    minC, maxC = params.min_num_components, params.max_num_components
    minN, maxN = params.min_num_nets, params.max_num_nets
    minPPN, maxPPN = params.min_num_pins_per_net, params.max_num_pins_per_net
    O = params.num_orientations
    if params.has_pins:
        wl_norm = float(params.wirelength_normalizer)
        int_norm = float(params.intersections_normalizer)
        lam_w = float(params.weight_wirelength)
        lam_i = float(params.weight_num_intersections)
        penalty = -(lam_w * (params.max_wirelength / wl_norm)
                    + lam_i * (params.max_num_intersections / int_norm))
    else:
        penalty = 0.0
    if params.variant == Variant.SQUARE:
        combos = [(params.component_n, params.component_n)]
    else:
        combos = _footprints(params)
    B = block

    def kernel(seed_ref,  # noqa: complexity — one fused rollout program by design
               grid_ref, ch_ref, cw_ref, cur_ref, numc_ref,
               prx_ref, pry_ref, pax_ref, pay_ref, pnet_ref, pcomp_ref,
               npin_ref, p0_ref, p1_ref,
               o_grid, o_ch, o_cw, o_cur, o_numc,
               o_prx, o_pry, o_pax, o_pay, o_pnet, o_pcomp,
               o_npin, o_p0, o_p1, o_rsum, o_dcnt):
        seed_u = seed_ref[0].astype(U32)
        blk_u = pl.program_id(0).astype(U32)

        # ---- constants built once per block ------------------------------
        cell = jax.lax.broadcasted_iota(I32, (1, A), 1)
        cell_x = cell // W
        cell_y = cell % W
        iota_p = jax.lax.broadcasted_iota(I32, (1, P), 1)
        # rectangle-sum matmul matrices + in-bounds rows per footprint
        covers = {}
        inb = {}
        rr = jax.lax.broadcasted_iota(I32, (A, A), 0)   # source cell
        ss = jax.lax.broadcasted_iota(I32, (A, A), 1)   # anchor cell
        ri, rj = rr // W, rr % W
        sx, sy = ss // W, ss % W
        for (ph, pw) in combos:
            covers[(ph, pw)] = ((ri >= sx) & (ri < sx + ph)
                                & (rj >= sy) & (rj < sy + pw)).astype(F32)
            inb[(ph, pw)] = ((cell_x + ph <= H)
                             & (cell_y + pw <= W)).astype(F32)
        tri = (jax.lax.broadcasted_iota(I32, (A, A), 0)
               <= jax.lax.broadcasted_iota(I32, (A, A), 1)).astype(F32)

        def planes_for(grid_f, ch_c, cw_c, alive):
            """Legal planes (o=0 footprint (h,w); o=1 footprint (w,h))."""
            p0 = jnp.zeros((B, A), F32)
            p1 = jnp.zeros((B, A), F32)
            for (ph, pw) in combos:
                occ = jnp.dot(grid_f, covers[(ph, pw)],
                              preferred_element_type=F32)
                free = jnp.where(occ == 0.0, inb[(ph, pw)], 0.0)
                p0 = jnp.where((ch_c == ph) & (cw_c == pw), free, p0)
                p1 = jnp.where((cw_c == ph) & (ch_c == pw), free, p1)
            p0 = jnp.where(alive, p0, 0.0)
            p1 = jnp.where(alive, p1, 0.0)
            return p0, p1

        # ---- in-kernel instance generator --------------------------------
        def generate(rng):  # noqa: complexity — one traced generator per variant
            if params.variant == Variant.SQUARE:
                # unlimited supply of identical n x n components; the
                # episode only ends when the mask empties
                # (dummy_env_square.py:246-255; core.reset square branch)
                comp_h = jnp.full((B, C), params.component_n, I32)
                comp_w = jnp.full((B, C), params.component_n, I32)
                numc = jnp.full((B, 1), A, I32)
                neg = jnp.full((B, P), -1, I32)
                fgrid = jnp.zeros((B, A), F32)
                fp0, fp1 = planes_for(fgrid, comp_h[:, 0:1], comp_w[:, 0:1],
                                      jnp.full((B, 1), True))
                return (fgrid, comp_h, comp_w, jnp.zeros((B, 1), I32), numc,
                        neg, neg, neg, neg, neg, neg,
                        jnp.zeros((B, 1), I32), fp0, fp1)

            comp_h = rng.randint(minH, maxH, (B, C))
            comp_w = rng.randint(minW, maxW, (B, C))
            numc = rng.randint(minC, maxC, (B, 1))
            cvalid = jax.lax.broadcasted_iota(I32, (B, C), 1) < numc
            comp_h = jnp.where(cvalid, comp_h, 0)
            comp_w = jnp.where(cvalid, comp_w, 0)
            area = comp_h * comp_w
            total_area = jnp.sum(area, axis=1, keepdims=True)

            if not params.has_pins:
                # RECT: component sampling only (generate_instances,
                # dummy_env_rectangular.py:253-276)
                neg = jnp.full((B, P), -1, I32)
                fgrid = jnp.zeros((B, A), F32)
                fp0, fp1 = planes_for(fgrid, comp_h[:, 0:1], comp_w[:, 0:1],
                                      jnp.full((B, 1), True))
                return (fgrid, comp_h, comp_w, jnp.zeros((B, 1), I32), numc,
                        neg, neg, neg, neg, neg, neg,
                        jnp.zeros((B, 1), I32), fp0, fp1)

            nn = rng.randint(minN, maxN, (B, 1))
            nn = jnp.maximum(jnp.minimum(nn, total_area // 2), 1)
            tp = rng.randint(minPPN * nn, maxPPN * nn, (B, 1))
            tp = jnp.minimum(tp, total_area)

            iota_n = jax.lax.broadcasted_iota(I32, (B, N), 1)
            net_open = iota_n < nn
            base = jnp.where(net_open, minPPN, 0)
            if maxPPN > minPPN:
                # softmax(N(1/nn, 1/(net_distribution+1))) over open nets,
                # capped multinomial for the extra pins
                # (allocate_pins_to_nets:1067).
                u1 = jnp.maximum(rng.uniform((B, N)), F32(1e-7))
                u2 = rng.uniform((B, N))
                z = jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(
                    F32(6.2831853) * u2)
                mean = 1.0 / jnp.maximum(nn, 1).astype(F32)
                s = mean + z / F32(params.net_distribution + 1.0)
                s = jnp.where(net_open, s, -1e9)
                e = jnp.exp(s - jnp.max(s, axis=1, keepdims=True))
                probs = e / jnp.sum(e, axis=1, keepdims=True)
                extra_total = jnp.maximum(tp - minPPN * nn, 0)
                caps = jnp.where(
                    net_open,
                    jnp.minimum(maxPPN - minPPN, extra_total), 0)
                cprob_cols = _cumsum_cols(
                    [probs[:, c:c + 1] for c in range(N)])
                T = (maxPPN - minPPN) * N
                ut = rng.uniform((B, T))
                bint = jnp.zeros((B, T), I32)
                for c in range(N - 1):
                    bint = bint + (ut > cprob_cols[c]).astype(I32)
                active = (jax.lax.broadcasted_iota(I32, (B, T), 1)
                          < extra_total)
                cnt_cols = [jnp.sum(((bint == c) & active).astype(I32),
                                    axis=1, keepdims=True)
                            for c in range(N)]
                cap_cols = [caps[:, c:c + 1] for c in range(N)]
                cnt_cols = [jnp.minimum(cnt_cols[c], cap_cols[c])
                            for c in range(N)]
                # deterministic water-fill of the residue into open caps
                got = jnp.zeros((B, 1), I32)
                for c in range(N):
                    got = got + cnt_cols[c]
                resid = extra_total - got
                before = jnp.zeros((B, 1), I32)
                for c in range(N):
                    free_c = cap_cols[c] - cnt_cols[c]
                    cnt_cols[c] = cnt_cols[c] + jnp.clip(
                        resid - before, 0, free_c)
                    before = before + free_c
                net_counts = base + jnp.concatenate(cnt_cols, axis=1)
            else:
                net_counts = base

            num_pins = jnp.sum(net_counts, axis=1, keepdims=True)
            ncum_cols = _cumsum_cols(
                [net_counts[:, c:c + 1] for c in range(N)])
            ncum = jnp.concatenate(ncum_cols, axis=1)        # inclusive [B,N]

            # pins are net-grouped in table order (reference rebuilds
            # self.pins net-by-net, :1167-1169)
            pin_net = jnp.zeros((B, P), I32)
            for n in range(N):
                pin_net = pin_net + (iota_p >= ncum[:, n:n + 1]).astype(I32)
            in_use = iota_p < num_pins
            start_of = jnp.concatenate(
                [jnp.zeros((B, 1), I32), ncum[:, :-1]], axis=1)
            rank_in_net = iota_p - _lane_gather(
                start_of, jnp.minimum(pin_net, N - 1), N)

            # per-net pin->component allocation
            # (allocate_pins_to_components_for_net:1171)
            if params.variant == Variant.PIN_SPATIAL:
                k0 = (params.pin_spread * numc) // 10 + 1
            else:
                k0 = jnp.maximum(((params.pin_spread + 1) * numc) // 10, 1)
            k0 = jnp.minimum(k0, numc)

            space_cols = [area[:, i:i + 1] for i in range(C)]
            idx_cols = [jnp.full((B, 1), i, I32) for i in range(C)]
            comp_of_tables = []          # one [B, M] per net
            for n in range(N):
                m = net_counts[:, n:n + 1]
                key_cols = [space_cols[i] * (C + 1) + (C - 1 - i)
                            for i in range(C)]
                _, (s_space, s_idx) = _sort_desc_cols(
                    key_cols, [space_cols, idx_cols])
                csum = _cumsum_cols(s_space)
                not_enough = jnp.zeros((B, 1), I32)
                for c in range(C):
                    not_enough = not_enough + (csum[c] < m).astype(I32)
                k = jnp.maximum(k0, jnp.minimum(not_enough + 1, C))

                w_cols = [jnp.where(jnp.full((B, 1), i, I32) < k,
                                    s_space[i].astype(F32), 0.0)
                          for i in range(C)]
                tot_w = jnp.zeros((B, 1), F32)
                for c in range(C):
                    tot_w = tot_w + w_cols[c]
                tot_w = jnp.maximum(tot_w, F32(1e-9))
                cw_cum = _cumsum_cols(w_cols)
                ut = rng.uniform((B, M))
                binm = jnp.zeros((B, M), I32)
                for c in range(C - 1):
                    binm = binm + (ut > cw_cum[c] / tot_w).astype(I32)
                act = jax.lax.broadcasted_iota(I32, (B, M), 1) < m
                cnt_cols = [jnp.sum(((binm == c) & act).astype(I32),
                                    axis=1, keepdims=True)
                            for c in range(C)]
                cnt_cols = [jnp.minimum(cnt_cols[c], s_space[c])
                            for c in range(C)]
                got = jnp.zeros((B, 1), I32)
                for c in range(C):
                    got = got + cnt_cols[c]
                resid = m - got
                free_cols = [s_space[c] - cnt_cols[c] for c in range(C)]
                before = jnp.zeros((B, 1), I32)
                for c in range(C):
                    add = jnp.clip(resid - before, 0, free_cols[c])
                    cnt_cols[c] = cnt_cols[c] + add
                    before = before + free_cols[c]
                bounds = _cumsum_cols(cnt_cols)

                ranks = jax.lax.broadcasted_iota(I32, (B, M), 1)
                slot = jnp.zeros((B, M), I32)
                for c in range(C):
                    slot = slot + (ranks >= bounds[c]).astype(I32)
                slot = jnp.minimum(slot, C - 1)
                sidx_row = jnp.concatenate(s_idx, axis=1)     # [B, C]
                comp_of_tables.append(_lane_gather(sidx_row, slot, C))

                # consume space (write back through the sort permutation)
                rem_cols = [s_space[c] - cnt_cols[c] for c in range(C)]
                new_space = []
                for i in range(C):
                    v = jnp.zeros((B, 1), I32)
                    for c in range(C):
                        v = jnp.where(s_idx[c] == i, rem_cols[c], v)
                    new_space.append(v)
                active_net = jnp.full((B, 1), n, I32) < nn
                space_cols = [jnp.where(active_net, new_space[i],
                                        space_cols[i]) for i in range(C)]

            table = jnp.concatenate(comp_of_tables, axis=1)   # [B, N*M]
            gidx = jnp.minimum(pin_net, N - 1) * M + jnp.clip(
                rank_in_net, 0, M - 1)
            pin_comp = _lane_gather(table, gidx, N * M)
            pin_comp = jnp.where(in_use, pin_comp, -1)
            pin_net = jnp.where(in_use, pin_net, -1)

            # distinct random cells per component
            # (place_pins_on_component:1478): random permutation of the
            # component's cells; pins take successive cells in table order.
            scores = rng.uniform((B, C * PPC))
            cell_ids = jax.lax.broadcasted_iota(I32, (B, C * PPC), 1) % PPC
            area_of = jnp.concatenate(
                [jnp.broadcast_to(area[:, c:c + 1], (B, PPC))
                 for c in range(C)], axis=1)
            scores = jnp.where(cell_ids < area_of, scores, 2.0)
            cell_tab_cols = []
            for c in range(C):
                sc = [scores[:, c * PPC + k:c * PPC + k + 1]
                      for k in range(PPC)]
                ic = [jnp.full((B, 1), k, I32) for k in range(PPC)]
                # ascending by score: sort desc on negated score
                _, (_, perm) = _sort_desc_cols([-s for s in sc], [sc, ic])
                cell_tab_cols.extend(perm)
            cell_table = jnp.concatenate(cell_tab_cols, axis=1)  # [B, C*PPC]

            # rank of each pin within its component (table order)
            rank_cols = []
            cnt = [jnp.zeros((B, 1), I32) for _ in range(C)]
            for p in range(P):
                cp = pin_comp[:, p:p + 1]
                r = jnp.zeros((B, 1), I32)
                for c in range(C):
                    hit = cp == c
                    r = jnp.where(hit, cnt[c], r)
                    cnt[c] = cnt[c] + hit.astype(I32)
                rank_cols.append(r)
            rank_in_comp = jnp.concatenate(rank_cols, axis=1)  # [B, P]

            cidx = (jnp.maximum(pin_comp, 0) * PPC
                    + jnp.clip(rank_in_comp, 0, PPC - 1))
            pcell = _lane_gather(cell_table, cidx, C * PPC)
            wp = _lane_gather(comp_w, jnp.maximum(pin_comp, 0), C)
            rel_x = jnp.zeros((B, P), I32)
            rel_y = jnp.zeros((B, P), I32)
            for wv in range(max(minW, 1), maxW + 1):
                rel_x = jnp.where(wp == wv, pcell // wv, rel_x)
                rel_y = jnp.where(wp == wv, pcell % wv, rel_y)
            used = pin_comp >= 0
            rel_x = jnp.where(used, rel_x, -1)
            rel_y = jnp.where(used, rel_y, -1)
            neg = jnp.full((B, P), -1, I32)

            fgrid = jnp.zeros((B, A), F32)
            fp0, fp1 = planes_for(fgrid, comp_h[:, 0:1], comp_w[:, 0:1],
                                  jnp.full((B, 1), True))
            return (fgrid, comp_h, comp_w, jnp.zeros((B, 1), I32), numc,
                    rel_x, rel_y, neg, neg, pin_net, pin_comp, num_pins,
                    fp0, fp1)

        # ---- the rollout loop ---------------------------------------------
        def body(t, carry):
            (grid, ch, cw, cur, numc, prx, pry, pax, pay, pnet, pcomp,
             npin, p0, p1, rsum, dcnt) = carry
            rng = _Rng(seed_u ^ (blk_u * U32(0x9e3779b9))
                       ^ (t.astype(U32) * U32(0x85ebca6b)))

            c0 = jnp.sum(p0, axis=1, keepdims=True)
            c1 = jnp.sum(p1, axis=1, keepdims=True)
            if O == 1:                       # SQUARE: one plane
                total = c0
            elif O == 2:                     # RECT: two distinct planes
                total = c0 + c1
            else:                            # PIN: planes 2,3 copy 0,1 (:1866)
                total = 2.0 * (c0 + c1)
            alive = total > 0.0

            u = rng.uniform((B, 1))
            tgt = jnp.minimum(jnp.floor(u * total), total - 1.0)
            tgt = jnp.maximum(tgt, 0.0)
            pre1 = c0
            if O == 1:
                osel = jnp.zeros((B, 1), I32)
                tin = tgt
            elif O == 2:
                osel = (tgt >= pre1).astype(I32)
                tin = tgt - jnp.where(osel == 0, 0.0, pre1)
            else:
                pre2 = c0 + c1
                pre3 = pre2 + c0
                osel = ((tgt >= pre1).astype(I32) + (tgt >= pre2).astype(I32)
                        + (tgt >= pre3).astype(I32))
                tin = tgt - jnp.where(
                    osel == 0, 0.0, jnp.where(
                        osel == 1, pre1, jnp.where(osel == 2, pre2, pre3)))
            plane = jnp.where(osel % 2 == 0, p0, p1)
            cs = jnp.dot(plane, tri, preferred_element_type=F32)
            idx = jnp.sum((cs <= tin).astype(I32), axis=1, keepdims=True)
            idx = jnp.minimum(idx, A - 1)
            xx = idx // W
            yy = idx % W

            chc = _lane_gather(ch, jnp.minimum(cur, C - 1), C)
            cwc = _lane_gather(cw, jnp.minimum(cur, C - 1), C)
            ph = jnp.where(osel % 2 == 0, chc, cwc)
            pw = jnp.where(osel % 2 == 0, cwc, chc)

            ind = ((cell_x >= xx) & (cell_x < xx + ph)
                   & (cell_y >= yy) & (cell_y < yy + pw))
            grid = jnp.where(ind & alive, 1.0, grid)

            if params.has_pins:
                # pin rotation (Component.place_component:156-204)
                mine = (pcomp == cur) & alive
                r0, r1 = prx, pry
                nrx = jnp.where(osel == 0, r0,
                                jnp.where(osel == 1, r1,
                                          jnp.where(osel == 2, chc - r0 - 1,
                                                    cwc - r1 - 1)))
                nry = jnp.where(osel == 0, r1,
                                jnp.where(osel == 1, chc - r0 - 1,
                                          jnp.where(osel == 2, cwc - r1 - 1,
                                                    r0)))
                prx = jnp.where(mine, nrx, prx)
                pry = jnp.where(mine, nry, pry)
                pax = jnp.where(mine, xx + prx, pax)
                pay = jnp.where(mine, yy + pry, pay)

            cur = cur + alive.astype(I32)
            placed_all = cur >= numc

            np0, np1 = planes_for(grid, _lane_gather(
                ch, jnp.minimum(cur, C - 1), C), _lane_gather(
                cw, jnp.minimum(cur, C - 1), C), ~placed_all)
            nt = 2.0 * (jnp.sum(np0, axis=1, keepdims=True)
                        + jnp.sum(np1, axis=1, keepdims=True))
            done = (placed_all | (nt == 0.0)) | ~alive
            p0, p1 = np0, np1

            any_done = jnp.any(done)

            def on_done(args):
                pax_, pay_, pnet_, npin_ = args
                if params.has_pins:
                    routed = fused_routing.reward_rows(
                        params, pax_, pay_, pnet_, npin_)
                else:
                    routed = jnp.zeros((B, 1), F32)
                fresh = generate(rng)
                return routed, fresh

            def no_done(args):
                pax_, pay_, pnet_, npin_ = args
                zero = jnp.zeros((B, 1), F32)
                fresh = (grid, ch, cw, cur, numc, prx, pry, pax_, pay_,
                         pnet_, pcomp, npin_, p0, p1)
                return zero, fresh

            routed, fresh = jax.lax.cond(
                any_done, on_done, no_done, (pax, pay, pnet, npin))

            if params.has_pins:
                # sparse terminal routing reward; invalid-action penalty
                reward = jnp.where(
                    done,
                    jnp.where(placed_all & alive, routed, F32(penalty)),
                    0.0)
            else:
                # SQUARE/RECT: +1 per successful placement, terminal or not
                # (dummy_env_square.py:115-153, dummy_env_rectangular.py:353)
                reward = jnp.where(alive, F32(1.0), F32(0.0))
            rsum = rsum + reward
            dcnt = dcnt + done.astype(I32)

            (fgrid, fch, fcw, fcur, fnumc, frx, fry, fax, fay, fnet,
             fcomp, fnpin, fp0, fp1) = fresh
            grid = jnp.where(done, fgrid, grid)
            ch = jnp.where(done, fch, ch)
            cw = jnp.where(done, fcw, cw)
            cur = jnp.where(done, fcur, cur)
            numc = jnp.where(done, fnumc, numc)
            prx = jnp.where(done, frx, prx)
            pry = jnp.where(done, fry, pry)
            pax = jnp.where(done, fax, pax)
            pay = jnp.where(done, fay, pay)
            pnet = jnp.where(done, fnet, pnet)
            pcomp = jnp.where(done, fcomp, pcomp)
            npin = jnp.where(done, fnpin, npin)
            p0 = jnp.where(done, fp0, p0)
            p1 = jnp.where(done, fp1, p1)

            return (grid, ch, cw, cur, numc, prx, pry, pax, pay, pnet,
                    pcomp, npin, p0, p1, rsum, dcnt)

        carry = (grid_ref[:], ch_ref[:], cw_ref[:], cur_ref[:], numc_ref[:],
                 prx_ref[:], pry_ref[:], pax_ref[:], pay_ref[:],
                 pnet_ref[:], pcomp_ref[:], npin_ref[:],
                 p0_ref[:], p1_ref[:],
                 jnp.zeros((B, 1), F32), jnp.zeros((B, 1), I32))
        carry = jax.lax.fori_loop(0, num_steps, body, carry)
        (grid, ch, cw, cur, numc, prx, pry, pax, pay, pnet, pcomp,
         npin, p0, p1, rsum, dcnt) = carry
        o_grid[:] = grid
        o_ch[:] = ch
        o_cw[:] = cw
        o_cur[:] = cur
        o_numc[:] = numc
        o_prx[:] = prx
        o_pry[:] = pry
        o_pax[:] = pax
        o_pay[:] = pay
        o_pnet[:] = pnet
        o_pcomp[:] = pcomp
        o_npin[:] = npin
        o_p0[:] = p0
        o_p1[:] = p1
        blk = pl.program_id(0)
        o_rsum[blk, 0] = jnp.sum(rsum)
        o_dcnt[blk, 0] = jnp.sum(dcnt)

    return kernel


# ---------------------------------------------------------------------------
# Host-side wrappers
# ---------------------------------------------------------------------------

_LEAVES = ("grid", "comp_h", "comp_w", "cursor", "num_components",
           "pin_rel_x", "pin_rel_y", "pin_abs_x", "pin_abs_y",
           "pin_net", "pin_comp", "num_pins", "plane0", "plane1")


def init_leaves(params: EnvParams, key, batch: int) -> Dict[str, jnp.ndarray]:
    """Fresh [batch]-board kernel state from the (tested) pure-JAX reset."""
    from placement_tpu.env import core
    states = jax.vmap(lambda k: core.reset(params, k))(
        jax.random.split(key, batch))
    return leaves_from_states(params, states)


def leaves_from_states(params: EnvParams, states) -> Dict[str, jnp.ndarray]:
    """Convert an already-batched EnvState into the kernel's row layout
    (cheap reshapes/casts only — callers that already hold reset states,
    e.g. bench.py, avoid recompiling the batched generator)."""
    batch = states.done.shape[0]
    return {
        "grid": states.grid.reshape(batch, -1).astype(F32),
        "comp_h": states.comp_h.astype(I32),
        "comp_w": states.comp_w.astype(I32),
        "cursor": states.cursor.reshape(batch, 1).astype(I32),
        "num_components": states.num_components.reshape(batch, 1).astype(I32),
        "pin_rel_x": states.pin_rel_x.astype(I32),
        "pin_rel_y": states.pin_rel_y.astype(I32),
        "pin_abs_x": states.pin_abs_x.astype(I32),
        "pin_abs_y": states.pin_abs_y.astype(I32),
        "pin_net": states.pin_net.astype(I32),
        "pin_comp": states.pin_comp.astype(I32),
        "num_pins": states.num_pins.reshape(batch, 1).astype(I32),
        "plane0": states.action_mask[:, 0].reshape(batch, -1).astype(F32),
        # the square variant has a single orientation plane; the kernel
        # never reads plane1 when num_orientations == 1
        "plane1": states.action_mask[:, min(
            1, states.action_mask.shape[1] - 1)].reshape(batch, -1).astype(F32),
    }


def make_fused_rollout(params: EnvParams, batch: int, num_steps: int,
                       block: int = 128,
                       interpret: bool = False,
                       vmem_limit_bytes: int = None) -> "Callable":
    """Build `fn(leaves, seed) -> (leaves', reward_sum, done_count)`.

    `leaves` is the dict from `init_leaves`; `seed` an i32 scalar array that
    must differ between calls (it seeds the in-kernel hardware PRNG).
    ``vmem_limit_bytes`` raises Mosaic's default ~16 MB scoped-VMEM budget —
    required for ``block`` > 128 (the flagship working set at block=256
    overflows the default by ~1.5 MB).
    """
    block = min(block, batch)
    if block > 128 and vmem_limit_bytes is None:
        raise ValueError(
            f"block={block} needs an explicit vmem_limit_bytes (Mosaic's "
            "default ~16 MB scoped-VMEM budget only fits block <= 128 on "
            "in-envelope configs)")
    ok, reasons = envelope_report(params, block=block,
                                  vmem_limit_bytes=vmem_limit_bytes)
    if not ok:
        raise ValueError(
            "configuration outside the fused-kernel envelope "
            f"({'; '.join(reasons)}); use the env.pooled path instead")
    if batch % block:
        raise ValueError("batch must be divisible by block")
    nblocks = batch // block
    kernel = _build_kernel(params, num_steps, block)

    def row_spec(name, width):
        return pl.BlockSpec((block, width), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    widths = {
        "grid": params.area, "comp_h": params.max_components,
        "comp_w": params.max_components, "cursor": 1, "num_components": 1,
        "pin_rel_x": params.max_pins, "pin_rel_y": params.max_pins,
        "pin_abs_x": params.max_pins, "pin_abs_y": params.max_pins,
        "pin_net": params.max_pins, "pin_comp": params.max_pins,
        "num_pins": 1, "plane0": params.area, "plane1": params.area,
    }
    dtypes = {"grid": F32, "plane0": F32, "plane1": F32}

    in_specs = ([pl.BlockSpec(memory_space=pltpu.SMEM)]
                + [row_spec(n, widths[n]) for n in _LEAVES])
    out_specs = ([row_spec(n, widths[n]) for n in _LEAVES]
                 # whole [nblocks, 1] arrays in SMEM; each program writes its
                 # own row (per-block (1,1) blocking is rejected by Mosaic)
                 + [pl.BlockSpec(memory_space=pltpu.SMEM)] * 2)
    out_shape = ([jax.ShapeDtypeStruct((batch, widths[n]),
                                       dtypes.get(n, I32)) for n in _LEAVES]
                 + [jax.ShapeDtypeStruct((nblocks, 1), F32),
                    jax.ShapeDtypeStruct((nblocks, 1), I32)])

    # `interpret` runs the TPU interpreter (pltpu.InterpretParams) so the
    # kernel — including the hardware-PRNG primitives — executes on CPU for
    # the test-suite; plain `interpret=True` has no CPU rule for prng_seed.
    call = pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=pltpu.InterpretParams() if interpret else False,
        compiler_params=(pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_bytes)
            if vmem_limit_bytes else None),
    )

    def fn(leaves: Dict[str, jnp.ndarray], seed) -> Tuple[Dict, jnp.ndarray,
                                                          jnp.ndarray]:
        seed_arr = jnp.asarray(seed, I32).reshape(1)
        outs = call(seed_arr, *[leaves[n] for n in _LEAVES])
        new_leaves = dict(zip(_LEAVES, outs[:len(_LEAVES)]))
        rsum = jnp.sum(outs[len(_LEAVES)])
        dcnt = jnp.sum(outs[len(_LEAVES) + 1])
        return new_leaves, rsum, dcnt

    return fn
