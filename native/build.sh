#!/bin/sh
# Build the native helpers into sailfish_tpu/_native.so.
# Requires g++ and zlib (both in the base image).
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -fPIC -shared -std=c++17 \
    sais.cpp fastq_decode.cpp \
    -lz \
    -o ../sailfish_tpu/_native.so
echo "built sailfish_tpu/_native.so"
