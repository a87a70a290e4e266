#!/bin/sh
# Build the native runtime library (see mct_native.cpp).
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -fPIC -shared -std=c++17 -o libmct_native.so mct_native.cpp
echo "built $(pwd)/libmct_native.so"
