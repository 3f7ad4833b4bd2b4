#!/bin/sh
# Builds the native dataset loader shared library next to this script.
set -e
cd "$(dirname "$0")"
g++ -O2 -shared -fPIC -std=c++17 dataset_loader.cpp \
    -lpng -lz -lpthread -o libbadslam_loader.so
echo "built $(pwd)/libbadslam_loader.so"
