#!/bin/sh
# Build the native IO library next to this script.
set -e
cd "$(dirname "$0")"
g++ -O3 -fPIC -shared -o libworldtpu_io.so wavio.cc
echo "built $(pwd)/libworldtpu_io.so"
