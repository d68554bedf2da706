#!/bin/sh
# Build the native shared libraries (ARPS reader, grid engine).
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -pthread -o libarps.so arps.cpp -lz
g++ -O3 -march=native -shared -fPIC -pthread -o libgridenv.so gridenv.cpp
echo "built $(pwd)/libarps.so $(pwd)/libgridenv.so"
