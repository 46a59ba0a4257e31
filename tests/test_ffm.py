"""FFM text reader (data/ffm.py) vs the reference FFMTextIterator
semantics (io/iterator.py:27-221): 1-based -> 0-based id shift,
impression-id split, streaming batch sizes, and the recovered fm CSR
triple."""

import numpy as np

from clsr_tpu.data.ffm import (FFMTextReader, fm_sparse_triple,
                               parse_ffm_line)


LINES = [
    "1 1:3:1.0 1:7:0.5 2:2:2.0",
    "0 2:5:1.5 3:9:1.0 % imp42",
    "1 1:1:1.0",
    "0 3:4:0.25 3:6:0.75 3:8:1.0",
    "1 2:2:1.0 1:3:0.5",
]


def test_parse_line_shifts_ids_and_splits_impression():
    label, feats, imp = parse_ffm_line(LINES[1])
    assert label == 0.0
    assert feats == [(1, 4, 1.5), (2, 8, 1.0)]   # 0-based
    assert imp == "imp42"
    _, _, imp0 = parse_ffm_line(LINES[0])
    assert imp0 == 0                              # reference default


def test_streaming_batches_and_padding(tmp_path):
    p = tmp_path / "ffm.txt"
    p.write_text("\n".join(LINES) + "\n")
    reader = FFMTextReader(feature_count=10, field_count=3, batch_size=2)
    batches = list(reader.load_data_from_file(str(p)))
    assert [b.batch_size for b in batches] == [2, 2, 1]  # final partial

    b0 = batches[0]
    # row 0: field 0 has feats 2 (w 1.0) and 6 (w 0.5); field 1 feat 1
    assert b0.feat_ids[0, 0, 0] == 2 and b0.feat_weights[0, 0, 0] == 1.0
    assert b0.feat_ids[0, 0, 1] == 6 and b0.feat_weights[0, 0, 1] == 0.5
    assert b0.feat_ids[0, 1, 0] == 1 and b0.feat_weights[0, 1, 0] == 2.0
    assert b0.feat_mask[0, 2].sum() == 0          # field 2 empty
    assert b0.impression_ids == [0, "imp42"]
    # M sizes to the batch max features-per-field (2 here)
    assert b0.feat_ids.shape == (2, 3, 2)

    # one-hot weighted sum == manual expectation (the lookup both
    # model families start from)
    dense = np.zeros((2, 10), np.float32)
    rows, fields, slots = np.nonzero(b0.feat_mask)
    np.add.at(dense, (rows, b0.feat_ids[rows, fields, slots]),
              b0.feat_weights[rows, fields, slots])
    assert dense[0, 2] == 1.0 and dense[0, 6] == 0.5 and dense[0, 1] == 2.0


def test_fm_sparse_triple_roundtrip(tmp_path):
    p = tmp_path / "ffm.txt"
    p.write_text("\n".join(LINES) + "\n")
    reader = FFMTextReader(feature_count=10, field_count=3, batch_size=5)
    (batch,) = reader.load_data_from_file(str(p))
    indices, values, shape = fm_sparse_triple(batch, 10)
    assert shape.tolist() == [5, 10]
    # scatter into dense and compare against line-by-line parse
    dense = np.zeros((5, 10), np.float32)
    np.add.at(dense, (indices[:, 0], indices[:, 1]), values)
    for i, line in enumerate(LINES):
        _, feats, _ = parse_ffm_line(line)
        expect = np.zeros(10, np.float32)
        for _, feat, val in feats:
            expect[feat] += val
        np.testing.assert_allclose(dense[i], expect, err_msg=str(i))
