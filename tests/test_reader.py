import numpy as np

from hlax.data.reader import encode_raw
from hlax.types import compile_layout


TYPES = [
    {"type": "real", "dim": 1, "nclass": 1},
    {"type": "cat", "dim": 1, "nclass": 3},
    {"type": "ordinal", "dim": 1, "nclass": 4},
    {"type": "count", "dim": 1, "nclass": 1},
    {"type": "pos", "dim": 1, "nclass": 1},
]


def _raw():
    return np.array([
        [0.5, 0.0, 0.0, 0.0, 1.0],
        [1.5, 1.0, 1.0, 2.0, 2.0],
        [-.5, 2.0, 2.0, 5.0, 0.5],
        [2.5, 1.0, 3.0, 1.0, 3.0],
    ])


def test_onehot_and_thermometer():
    ds = encode_raw(_raw(), TYPES)
    lay = ds.layout
    # undo grouping to inspect in original column order
    data = ds.data[:, lay.exp_inv]
    # columns: real(1) cat(3) ordinal(4) count(1) pos(1)
    real, cat, ordi, count, pos = (data[:, 0], data[:, 1:4],
                                   data[:, 4:8], data[:, 8], data[:, 9])
    np.testing.assert_array_equal(real, _raw()[:, 0])
    np.testing.assert_array_equal(cat, np.eye(3)[[0, 1, 2, 1]])
    # thermometer: level k -> first k+1 ones
    expect = np.array([[1, 0, 0, 0], [1, 1, 0, 0], [1, 1, 1, 0], [1, 1, 1, 1]])
    np.testing.assert_array_equal(ordi, expect)
    # count had min 0 -> +1 shift (read_functions.py:102-105)
    np.testing.assert_array_equal(count, _raw()[:, 3] + 1)
    np.testing.assert_array_equal(pos, _raw()[:, 4])


def test_count_no_shift_when_min_positive():
    types = [{"type": "count", "dim": 1, "nclass": 1}]
    raw = np.array([[1.0], [3.0]])
    ds = encode_raw(raw, types)
    np.testing.assert_array_equal(ds.data[:, 0], [1.0, 3.0])


def test_nan_handling_and_masks():
    raw = _raw()
    raw[0, 0] = np.nan
    true_mask = np.ones((4, 5))
    true_mask[0, 0] = 0
    miss = np.ones((4, 5))
    miss[1, 2] = 0
    ds = encode_raw(raw, TYPES, miss_mask=miss, true_miss_mask=true_mask)
    lay = ds.layout
    mask = ds.mask[:, lay.raw_inv]
    # effective mask = miss * true
    assert mask[0, 0] == 0 and mask[1, 2] == 0 and mask[2, 2] == 1
    data = ds.data[:, lay.exp_inv]
    assert data[0, 0] == 0.0   # NaN -> 0


def test_theta_mask_broadcast():
    ds = encode_raw(_raw(), TYPES, miss_mask=np.array(
        [[1, 0, 1, 1, 1]] * 4, dtype=float))
    lay = ds.layout
    for g in lay.groups:
        blk = ds.theta_mask[:, g.theta_slice[0]:g.theta_slice[1]]
        raw = ds.mask[:, g.raw_slice[0]:g.raw_slice[1]]
        per_var = blk.shape[1] // g.n_vars
        if g.kind in ("cat", "ordinal"):
            np.testing.assert_array_equal(blk, np.repeat(raw, per_var, axis=1))
        else:
            np.testing.assert_array_equal(blk, raw)


def test_csv_roundtrip(tmp_path):
    raw = _raw()
    np.savetxt(tmp_path / "data.csv", raw, delimiter=",")
    with open(tmp_path / "types.csv", "w") as f:
        f.write("type, dim, nclass\n")
        for t in TYPES:
            f.write(f"{t['type']}, {t['dim']}, {t['nclass']}\n")
    # positional (0-based) mask file
    with open(tmp_path / "mask.csv", "w") as f:
        f.write("0,1\n2,3\n")
    from hlax.data.reader import read_data
    ds = read_data(str(tmp_path / "data.csv"), str(tmp_path / "mask.csv"),
                   None, str(tmp_path / "types.csv"))
    mask = ds.mask[:, ds.layout.raw_inv]
    assert mask[0, 1] == 0 and mask[2, 3] == 0
    assert mask.sum() == 4 * 5 - 2
    ds2 = encode_raw(raw, TYPES)
    np.testing.assert_allclose(ds.data, ds2.data)
