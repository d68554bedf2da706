#!/bin/sh
# Build the native ARPS reader shared library.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -pthread -o libarps.so arps.cpp -lz
echo "built $(pwd)/libarps.so"
