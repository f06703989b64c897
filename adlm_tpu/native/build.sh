#!/bin/sh
# Build the native data-path library.
set -e
cd "$(dirname "$0")"
# portable -O3 (no -march=native): the library auto-builds on first
# use per machine, but a copied binary must not SIGILL on older CPUs
g++ -O3 -shared -fPIC -o libadlm_data.so augment.cc
echo "built $(pwd)/libadlm_data.so"
