#!/bin/sh
# Build the nexus_tpu native host library (see nexus_native.cpp).
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -fPIC -shared -std=c++17 \
    -o libnexus_native.so nexus_native.cpp
echo "built $(pwd)/libnexus_native.so"
