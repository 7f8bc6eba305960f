"""Property test: the vectorized segmenter must reproduce the reference
writer's per-value state machine flush boundaries exactly
(/root/reference/runlengthintegerwriterv2.go:87-212 WriteInt + Flush).

``_state_machine_segments`` below is a faithful per-value re-implementation
of the state machine's bookkeeping (slow, test-only); the production
``rle2._segments`` is compared against it on adversarial inputs.
"""

import numpy as np
import pytest

from orc_ray.codecs import rle2


def _state_machine_segments(v):
    """Per-value emulation of WriteInt/Flush, yielding (kind, start, end):
    kind 0 = fixed-run flush (short-repeat or fixed-delta-0 path),
    kind 1 = variable flush (determineEncoding path)."""
    out = []
    buf_start = 0  # absolute index of literals[0]
    num = 0
    fixed = 0
    var = 0
    prev_delta = 0

    def flush_var(start, count):
        out.append((1, start, start + count))

    def flush_fixed(start, count):
        out.append((0, start, start + count))

    i = 0
    n = len(v)
    while i < n:
        val = v[i]
        if num == 0:
            buf_start = i
            num = 1
            fixed = 1
            var = 1
        elif num == 1:
            prev_delta = val - v[buf_start]
            num = 2
            if val == v[buf_start]:
                fixed, var = 2, 0
            else:
                fixed, var = 0, 2
        else:
            last = v[buf_start + num - 1]
            cur_delta = val - last
            if prev_delta == 0 and cur_delta == 0:
                num += 1
                if var > 0:
                    fixed = 2
                fixed += 1
                if fixed >= 3 and var > 0:
                    # carve: flush variable part, keep 3-value tail
                    num -= 3
                    var -= 2
                    flush_var(buf_start, num)
                    buf_start = buf_start + num
                    num = 3
                    var = 0
                if fixed == 512:
                    # determineEncoding path (min==max -> delta0)
                    flush_var(buf_start, num) if False else flush_fixed(buf_start, num)
                    buf_start += num
                    num = 0
                    fixed = 0
                    var = 0
            else:
                if fixed >= 3:
                    flush_fixed(buf_start, num)
                    buf_start += num
                    num = 0
                    fixed = 0
                if 0 < fixed < 3:
                    if val != v[buf_start + num - 1]:
                        var = fixed
                        fixed = 0
                if num == 0:
                    buf_start = i
                    num = 1
                    fixed = 1
                    var = 1
                else:
                    prev_delta = val - v[buf_start + num - 1]
                    num += 1
                    var += 1
                    if var == 512:
                        flush_var(buf_start, num)
                        buf_start += num
                        num = 0
                        var = 0
        i += 1
    # Flush()
    if num:
        if var:
            flush_var(buf_start, num)
        elif fixed:
            if fixed < 3:
                flush_var(buf_start, num)
            else:
                flush_fixed(buf_start, num)
    return out


CASES = []
rng = np.random.default_rng(123)
CASES.append(rng.integers(0, 50, 3000).tolist())             # many short runs
CASES.append(rng.integers(0, 10**6, 3000).tolist())          # no runs
parts = []
for _ in range(60):
    parts.append(rng.integers(0, 5, rng.integers(1, 20)))
    parts.append(np.full(rng.integers(1, 1200), int(rng.integers(0, 5))))
CASES.append(np.concatenate(parts).astype(np.int64).tolist())  # runny
CASES.append([7] * 5000)                                      # one huge run
CASES.append(np.concatenate([rng.integers(0, 9, 511), [3, 3, 3, 3]]).tolist())
CASES.append(np.concatenate([rng.integers(100, 900, 510), [5, 5, 5, 5, 5, 1]]).tolist())
CASES.append([1, 1, 2, 2, 3, 3] * 400)                        # pairs only
CASES.append(np.repeat(rng.integers(0, 4, 500), 3).tolist())  # len-3 runs
for ncut in (511, 512, 513, 514):
    CASES.append(np.concatenate([rng.integers(0, 9, ncut), np.full(600, 7)]).tolist())


@pytest.mark.parametrize("case_idx", range(len(CASES)))
def test_segments_match_state_machine(case_idx):
    v = np.array(CASES[case_idx], dtype=np.int64)
    fast = list(rle2._segments(v))
    ref = _state_machine_segments(v)
    assert fast == ref


def test_segments_random_fuzz():
    rng = np.random.default_rng(7)
    for _ in range(30):
        parts = []
        for _ in range(rng.integers(1, 30)):
            kind = rng.integers(0, 3)
            if kind == 0:
                parts.append(rng.integers(0, 6, rng.integers(1, 50)))
            elif kind == 1:
                parts.append(np.full(rng.integers(1, 700), int(rng.integers(0, 6))))
            else:
                parts.append(np.arange(rng.integers(1, 100)))
        v = np.concatenate(parts).astype(np.int64)
        assert list(rle2._segments(v)) == _state_machine_segments(v)
        buf = rle2.encode(v, False)
        np.testing.assert_array_equal(rle2.decode(buf, False), v)
