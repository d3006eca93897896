#!/bin/sh
# Build the golden reference demodulator from the read-only reference tree.
# Usage: build.sh <output_binary>
set -e
REF=${REF:-/root/reference}
HERE=$(dirname "$0")
OUT=${1:-/tmp/golden_demod}

g++ -O2 -std=c++17 -I "$REF/src" \
    "$HERE/golden_main.cpp" \
    "$HERE/stub_fft.cpp" \
    "$REF/src/app.cpp" \
    "$REF"/src/fm_demod/*.cpp \
    "$REF/src/dsp/filter_designer.cpp" \
    "$REF/src/dsp/calculate_fft_mag.cpp" \
    "$REF"/src/dsp/simd/*.cpp \
    "$REF"/src/rds_decoder/*.cpp \
    -o "$OUT"
echo "$OUT"
