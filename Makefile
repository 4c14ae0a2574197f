# Convenience targets (the reference's cpu/makefile + gpu/makefile analog:
# here the device code is jit-compiled, so `make` only builds the native
# host runtime and drives tests/benchmarks).

PY ?= python

.PHONY: all native test tpu-test bench sweep clean

all: native

native: parallel_ray_tracer_tpu/native/librtnative.so

parallel_ray_tracer_tpu/native/librtnative.so: parallel_ray_tracer_tpu/native/src/rtnative.cpp
	g++ -O3 -march=native -std=c++17 -shared -fPIC $< -o $@

# Full suite, split into a few pytest processes (a single process can
# SIGABRT inside XLA compilation under accumulated compile load on small
# hosts — see scripts/run_tests.sh).
test: native
	PY=$(PY) bash scripts/run_tests.sh

# Hardware-gated compiled matrix + reference parity, with committed
# evidence (metrics/tpu_matrix.json). Requires a real TPU backend.
tpu-test: native
	PY=$(PY) bash scripts/run_tpu_tests.sh

bench: native
	$(PY) bench.py

sweep: native
	$(PY) scripts/sweep.py

# NOTE: metrics/ holds COMMITTED measurement evidence — never rm it here.
clean:
	rm -f parallel_ray_tracer_tpu/native/librtnative.so
