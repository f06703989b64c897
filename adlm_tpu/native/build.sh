#!/bin/sh
# Build the native data-path library.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -o libadlm_data.so augment.cc
echo "built $(pwd)/libadlm_data.so"
