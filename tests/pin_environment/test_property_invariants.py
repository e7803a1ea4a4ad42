"""Config-space property tests with an independent NumPy oracle.

The golden/parity suites pin a handful of geometries; this suite sweeps
edge-case configurations (1-cell components, non-square grids, components
as large as the board, single-net instances) and checks step invariants
against a NumPy reimplementation of the legality rule written directly
from the reference semantics (convolve-free window sums,
dummy_env_rectangular_pin.py:1846-1850 + rows_cols_to_mask:1767) — an
oracle independent of ops/sat.py's summed-area-table implementation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from placement_tpu.agent.random_policy import random_action
from placement_tpu.env import core
from placement_tpu.env.types import EnvParams, Variant

CONFIGS = {
    "one_cell_components": EnvParams(
        variant=Variant.PIN, height=5, width=5,
        min_component_w=1, max_component_w=1,
        min_component_h=1, max_component_h=1,
        min_num_components=2, max_num_components=4,
        min_num_nets=1, max_num_nets=1,
        min_num_pins_per_net=2, max_num_pins_per_net=2,
        reward_type="centroid"),
    "non_square_grid": EnvParams(
        variant=Variant.PIN, height=4, width=9,
        min_component_w=2, max_component_w=3,
        min_component_h=1, max_component_h=2,
        min_num_components=2, max_num_components=4,
        min_num_nets=2, max_num_nets=3,
        min_num_pins_per_net=2, max_num_pins_per_net=2,
        reward_type="both"),
    "board_sized_component": EnvParams(
        variant=Variant.PIN, height=6, width=6,
        min_component_w=2, max_component_w=6,
        min_component_h=2, max_component_h=6,
        min_num_components=1, max_num_components=2,
        min_num_nets=1, max_num_nets=2,
        min_num_pins_per_net=2, max_num_pins_per_net=3,
        reward_type="centroid"),
    "rect_tall": EnvParams(
        variant=Variant.RECT, height=9, width=4,
        min_component_w=1, max_component_w=2,
        min_component_h=1, max_component_h=4,
        min_num_components=3, max_num_components=6),
    "spatial_small": EnvParams(
        variant=Variant.PIN_SPATIAL, height=5, width=6,
        min_component_w=2, max_component_w=2,
        min_component_h=1, max_component_h=2,
        min_num_components=2, max_num_components=3,
        min_num_nets=1, max_num_nets=2,
        min_num_pins_per_net=2, max_num_pins_per_net=4,
        reward_type="both"),
}


def _oracle_mask(grid, ph, pw, n_orient, all_placed):
    """Reference-semantics legality planes, straight NumPy window sums."""
    h, w = grid.shape
    mask = np.zeros((n_orient, h, w), bool)
    if all_placed or ph <= 0 or pw <= 0:
        return mask
    for o in range(n_orient):
        eh, ew = (ph, pw) if o % 2 == 0 else (pw, ph)
        for x in range(h - eh + 1):
            for y in range(w - ew + 1):
                mask[o, x, y] = grid[x:x + eh, y:y + ew].sum() == 0
    return mask


@pytest.mark.parametrize("name", sorted(CONFIGS))
def test_step_invariants_against_numpy_oracle(name):
    params = CONFIGS[name].validate()
    step_j = jax.jit(lambda s, a: core.step(params, s, a))
    for seed in range(3):
        state = core.reset(params, jax.random.PRNGKey(seed))
        placed_area = 0
        for t in range(params.max_components + 1):
            grid = np.asarray(state.grid)
            # occupancy == sum of placed component areas, cells binary
            assert set(np.unique(grid)) <= {0, 1}, (name, seed, t)
            assert grid.sum() == placed_area, (name, seed, t)

            # action mask equals the independent oracle
            cur = min(int(state.cursor), params.max_components - 1)
            ph = int(state.comp_h[cur])
            pw = int(state.comp_w[cur])
            all_placed = int(state.cursor) >= int(state.num_components)
            want = _oracle_mask(grid, ph, pw, params.num_orientations,
                                all_placed)
            np.testing.assert_array_equal(
                np.asarray(state.action_mask), want,
                err_msg=f"{name} seed {seed} step {t}")

            if params.has_pins:
                # placed pins sit inside their component's footprint
                pax = np.asarray(state.pin_abs_x)
                pay = np.asarray(state.pin_abs_y)
                pc = np.asarray(state.pin_comp)
                cx = np.asarray(state.comp_x)
                cy = np.asarray(state.comp_y)
                for i in range(params.max_pins):
                    c = pc[i]
                    if c < 0 or c >= int(state.cursor):
                        continue
                    assert 0 <= pax[i] < params.height, (name, seed, t, i)
                    assert 0 <= pay[i] < params.width, (name, seed, t, i)
                    assert grid[pax[i], pay[i]] == 1, (name, seed, t, i)
                    assert cx[c] <= pax[i] and cy[c] <= pay[i]

            if bool(state.done) or not want.any():
                break
            a = random_action(jax.random.PRNGKey(1000 * seed + t), params,
                              jnp.asarray(state.action_mask)[None])[0]
            o = int(a[0])
            eh, ew = (ph, pw) if o % 2 == 0 else (pw, ph)
            state, reward, done, info = step_j(state, a)
            placed_area += eh * ew
            if params.has_pins:
                # non-terminal pin steps pay zero reward
                if not bool(done):
                    assert float(reward) == 0.0, (name, seed, t)
                else:
                    assert float(reward) <= 0.0, (name, seed, t)
        else:
            pytest.fail(f"{name} seed {seed}: episode did not terminate")


@pytest.mark.parametrize("name", sorted(CONFIGS))
def test_reset_instance_invariants(name):
    """Generator invariants across the same edge-case configs, batched:
    counts within declared bounds, pins on valid components with distinct
    in-bounds cells, capacity respected (generate_instances:1006-1505)."""
    params = CONFIGS[name].validate()
    n = 64
    states = jax.jit(jax.vmap(lambda k: core.reset(params, k)))(
        jax.random.split(jax.random.PRNGKey(7), n))
    ch = np.asarray(states.comp_h)
    cw = np.asarray(states.comp_w)
    nc = np.asarray(states.num_components)
    assert ((nc >= params.min_num_components)
            & (nc <= params.max_num_components)).all()
    for b in range(n):
        for c in range(int(nc[b])):
            assert params.min_component_h <= ch[b, c] <= params.max_component_h
            assert params.min_component_w <= cw[b, c] <= params.max_component_w
    if not params.has_pins:
        return
    net = np.asarray(states.pin_net)
    comp = np.asarray(states.pin_comp)
    rx = np.asarray(states.pin_rel_x)
    ry = np.asarray(states.pin_rel_y)
    nn = np.asarray(states.num_nets)
    npn = np.asarray(states.num_pins)
    for b in range(n):
        valid = net[b] >= 0
        assert valid.sum() == npn[b]
        assert params.min_num_nets <= nn[b] <= params.max_num_nets
        for nid in range(int(nn[b])):
            cnt = int((net[b] == nid).sum())
            assert params.min_num_pins_per_net <= cnt \
                <= params.max_num_pins_per_net, (name, b, nid, cnt)
        for c in range(int(nc[b])):
            mine = valid & (comp[b] == c)
            cells = set()
            for i in np.nonzero(mine)[0]:
                assert 0 <= rx[b, i] < ch[b, c], (name, b, i)
                assert 0 <= ry[b, i] < cw[b, c], (name, b, i)
                cells.add((int(rx[b, i]), int(ry[b, i])))
            # distinct cells, never more pins than the component has cells
            assert len(cells) == int(mine.sum()) \
                <= int(ch[b, c]) * int(cw[b, c]), (name, b, c)
        # every valid pin sits on an existing component
        assert (comp[b][valid] >= 0).all()
        assert (comp[b][valid] < nc[b]).all()
