#!/bin/bash
# Sanitizer run for the native C++ entropy stage (SURVEY.md §5 "race
# detection / sanitizers": the host C++ parser runs under ASan/UBSan).
# Builds a sanitized copy of the library and runs the native test suite
# against it on the CPU backend.
set -euo pipefail
cd "$(dirname "$0")/.."

SAN_DIR=$(mktemp -d)
trap 'rm -rf "$SAN_DIR"' EXIT

g++ -O1 -g -fPIC -shared -std=c++17 -pthread \
    -fsanitize=address,undefined -fno-sanitize-recover=all \
    tpujpeg/native/entropy.cc -o "$SAN_DIR/entropy_asan.so"

# LD_PRELOAD the ASan runtime so the sanitized .so can load into python.
ASAN_RT=$(g++ -print-file-name=libasan.so)
export LD_PRELOAD="$ASAN_RT"
export ASAN_OPTIONS=detect_leaks=0  # python itself "leaks" at exit
export TPUJPEG_NATIVE_SO="$SAN_DIR/entropy_asan.so"

# Deselect tests that execute XLA-jitted code: LLVM JIT pages are not
# ASan-instrumented and crash under the preloaded runtime. Everything
# that exercises the C++ library itself stays in.
python -m pytest tests/test_native.py -q -x \
    -k "not full_decode_bit_exact"
# The fused scan walk's property tests (FF-dense soup, cap-retry path)
# live in test_bitstream.py and are pure native+numpy.
python -m pytest tests/test_bitstream.py -q -x \
    -k "scan_walk or find_scan_end or destuffed"
echo "ASan/UBSan: native entropy tests clean"
