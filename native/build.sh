#!/bin/bash
# Build the native host data-pipeline library.
set -e
cd "$(dirname "$0")"
g++ -O3 -std=c++17 -shared -fPIC -pthread \
    image_pipeline.cpp -o libunigen_data.so
echo "built $(pwd)/libunigen_data.so"
