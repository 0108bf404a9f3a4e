import numpy as np
import pytest

from hlax.types import compile_layout


TYPES = [
    {"type": "real", "dim": 1, "nclass": 1},
    {"type": "cat", "dim": 1, "nclass": 3},
    {"type": "pos", "dim": 1, "nclass": 1},
    {"type": "cat", "dim": 1, "nclass": 3},
    {"type": "ordinal", "dim": 1, "nclass": 4},
    {"type": "count", "dim": 1, "nclass": 1},
    {"type": "real", "dim": 1, "nclass": 1},
    {"type": "beta", "dim": 1, "nclass": 1},
]


def test_group_sizes_and_perms():
    lay = compile_layout(TYPES)
    assert lay.n_raw == 8
    # exp: real 2 + cat 2*3 + pos 1 + ordinal 4 + count 1 + beta 1 = 15
    assert lay.n_exp == 15
    # theta: real 2, cat 6, pos 1, ordinal 4, count 1, beta 1 = 15
    assert lay.n_theta == 15
    # permutations are bijections
    for perm, inv, n in [(lay.raw_perm, lay.raw_inv, lay.n_raw),
                         (lay.exp_perm, lay.exp_inv, lay.n_exp),
                         (lay.theta_perm, lay.theta_inv, lay.n_theta)]:
        assert sorted(perm) == list(range(n))
        assert np.array_equal(perm[inv], np.arange(n))

    # slices tile the grouped space
    assert lay.groups[0].raw_slice[0] == 0
    stops = [g.raw_slice[1] for g in lay.groups]
    starts = [g.raw_slice[0] for g in lay.groups]
    assert starts[1:] == stops[:-1]
    assert stops[-1] == lay.n_raw


def test_grouping_matches_reference_index_maps():
    """Reproduce the reference's data_types_indexes/exp_types_indexes maps
    (read_functions.py:142-178) and check our perm produces the same groups."""
    lay = compile_layout(TYPES)
    # reference-style group keys
    keys = [((t["type"], str(t["dim"])) if t["type"] == "beta"
             else (t["type"], str(t["nclass"]))) for t in TYPES]
    set_of_types = sorted(set(keys))
    ref_group = np.array([set_of_types.index(k) for k in keys])
    assert np.array_equal(lay.raw_group_of_var, ref_group)
    # grouped order = variables sorted stably by group id
    expect_perm = np.argsort(ref_group, kind="stable")
    assert np.array_equal(lay.raw_perm, expect_perm)


def test_logvar_network_theta_layout():
    types = [
        {"type": "real", "dim": 1, "nclass": 1},
        {"type": "real", "dim": 1, "nclass": 1},
        {"type": "count", "dim": 1, "nclass": 1},
    ]
    lay = compile_layout(types, logvar_network=True)
    (g_count, g_real) = lay.groups  # sorted: count < real
    assert g_real.kind == "real"
    # 2 vars -> 4 theta cols laid out [mean0, mean1, logv0, logv1]
    assert g_real.theta_slice[1] - g_real.theta_slice[0] == 4
    m = np.array([[1.0, 0.0, 1.0]])   # var0 observed, var1 missing, count obs
    mg = m[:, lay.raw_perm]
    tm = lay.expand_raw_to_theta(mg)
    # grouped order: count first then real
    assert tm.shape == (1, 5)
    np.testing.assert_array_equal(tm[0], [1, 1, 0, 1, 0])


def test_expand_raw_to_exp():
    lay = compile_layout(TYPES)
    m = np.arange(8, dtype=float)[None, :]   # distinct values per var
    mg = m[:, lay.raw_perm]
    me = lay.expand_raw_to_exp(mg)
    assert me.shape == (1, lay.n_exp)
    for g in lay.groups:
        blk = me[0, g.exp_slice[0]:g.exp_slice[1]]
        raw = mg[0, g.raw_slice[0]:g.raw_slice[1]]
        assert np.array_equal(blk, np.repeat(raw, g.exp_per_var))


def test_bad_type_raises():
    with pytest.raises(ValueError):
        compile_layout([{"type": "gamma", "dim": 1, "nclass": 1}])
