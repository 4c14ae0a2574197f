#!/bin/sh
# Reproduce tests/goldens/reference/*.bmp.gz from the UNMODIFIED reference
# CPU renderer (/root/reference/cpu). The build is out-of-tree (the
# reference checkout is read-only); the only source edit is the SCENE
# macro for the second fixture (a config knob, cpu/include/options.h:40).
# Default config otherwise: 1920x1080, 4 bounces, heuristic 3, seed 1,
# ITERATIONS 1 (cpu/include/options.h:6-7,34,52,55,67).
set -e
REF=${1:-/root/reference}
OUT=${2:-tests/goldens/reference}
WORK=$(mktemp -d)
cp -r "$REF/cpu" "$WORK/cpu"
ln -s "$REF/assets" "$WORK/assets"
cd "$WORK/cpu"
make
./raytracer 4
gzip -9 -c car_boxed.bmp > "$OLDPWD/$OUT/car_boxed_1080p.bmp.gz"
sed -i 's/#define SCENE "car_boxed"/#define SCENE "car_only"/' include/options.h
make
./raytracer 4
gzip -9 -c car_only.bmp > "$OLDPWD/$OUT/car_only_1080p.bmp.gz"
cd "$OLDPWD"
rm -rf "$WORK"
echo "fixtures written to $OUT"
