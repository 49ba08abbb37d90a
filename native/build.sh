#!/bin/sh
# Build the native video I/O service -> native/libnunif_video.so
set -e
cd "$(dirname "$0")"
g++ -O2 -fPIC -shared -std=c++17 -fvisibility=hidden \
    video_io.cpp \
    -lavformat -lavcodec -lavutil -lswscale \
    -o libnunif_video.so
echo "built $(pwd)/libnunif_video.so"
