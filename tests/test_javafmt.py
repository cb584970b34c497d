import numpy as np

from kmergutsjava_tpu.utils.javafmt import jformat


def test_basic_six_decimals():
    assert jformat(1.0) == "1.000000"
    assert jformat(0.0) == "0.000000"
    assert jformat(2.5) == "2.500000"
    assert jformat(123.456789) == "123.456789"


def test_float32_promotion():
    # float32(0.1) == 0.100000001490116... exactly
    assert jformat(float(np.float32(0.1))) == "0.100000"
    assert jformat(float(np.float32(1.5))) == "1.500000"


def test_half_up_vs_half_even():
    # 0.0078125 == 2^-7 is exactly representable; exact decimal is
    # 0.0078125 -> Java HALF_UP gives 0.007813, C printf (half-even) 0.007812.
    assert jformat(0.0078125) == "0.007813"
    assert "%f" % 0.0078125 == "0.007812"  # sanity: they really differ
    assert jformat(-0.0078125) == "-0.007813"  # HALF_UP is away-from-zero
    assert jformat(0.0234375) == "0.023438"  # 3*2^-7, digit before is odd


def test_precision_3():
    assert jformat(0.0625, 3) == "0.063"  # 2^-4, exact tie, HALF_UP
    assert jformat(1.2345, 3) == "1.234"  # 1.2345 binary is 1.23449999...


def test_specials():
    assert jformat(float("nan")) == "NaN"
    assert jformat(float("inf")) == "Infinity"
    assert jformat(float("-inf")) == "-Infinity"
    assert jformat(-0.0) == "-0.000000"


def test_extreme_magnitudes():
    # float32 weights can reach 3.4e38; Java %f prints the full expansion
    assert jformat(float(np.float32(3.4e38))).endswith(".000000")
    assert len(jformat(1.7e308)) == 309 + 7
    assert jformat(5e-324) == "0.000000"  # smallest subnormal rounds to 0
    # the exact binary value of 1e25, as Java prints it
    assert jformat(1e25) == "10000000000000000905969664.000000"
