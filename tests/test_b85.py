"""b85 codec tests, including the reference's own test vector."""

import numpy as np

from dream_go_tpu.utils import b85


def test_reference_vector_pi_e():
    # src/libdg_utils/b85.rs:171-179: "NJ4Ny" decodes to f16 [3.140625, 2.71875]
    out = b85.decode_f16("NJ4Ny")
    np.testing.assert_array_equal(out, np.asarray([3.140625, 2.71875], np.float16))


def test_round_trip_f16():
    rng = np.random.default_rng(0)
    x = rng.normal(size=512).astype(np.float16)
    assert np.array_equal(b85.decode_f16(b85.encode(x)), x)


def test_round_trip_f32_narrows():
    x = np.asarray([3.140625, 2.71875], np.float32)
    assert b85.encode(x) == "NJ4Ny"


def test_round_trip_i8_i32():
    rng = np.random.default_rng(1)
    x8 = rng.integers(-128, 128, size=64).astype(np.int8)
    assert np.array_equal(b85.decode_i8(b85.encode(x8)), x8)
    x32 = rng.integers(-(2**31), 2**31, size=64).astype(np.int32)
    assert np.array_equal(b85.decode_i32(b85.encode(x32)), x32)


def test_decode_reference_loader_snippet():
    """Interop: the exact weights-JSON snippet embedded in the reference
    loader's own test (`src/libdg_nn/loader.rs:131-142`), which pins
    scale == 0.13704996 and a 2-entry f16 payload."""
    from dream_go_tpu.models import params as MP

    snippet = ('{"11v_value/linear_2/offset:0": '
               '{"s": "(^d>V", "t": "f2", "v": "(^d>V"}}')
    tensors = MP.decode_raw(snippet)
    assert list(tensors) == ["11v_value/linear_2/offset:0"]
    scale = np.frombuffer(b85.decode("(^d>V").tobytes(), np.float32)[0]
    assert scale == np.float32(0.13704996)
    vals = tensors["11v_value/linear_2/offset:0"]
    expected = np.frombuffer(b85.decode("(^d>V").tobytes(),
                             np.float16).astype(np.float32) * scale
    np.testing.assert_allclose(vals, expected)
