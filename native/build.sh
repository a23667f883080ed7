#!/bin/sh
# Build the native host kernels -> native/libtofsim.so
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -o libtofsim.so tofsim.cpp
echo "built $(pwd)/libtofsim.so"
