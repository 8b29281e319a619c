# Native kernel build (the Python loaders in ppg_tpu/*/native/__init__.py
# also rebuild on first use whenever the .so is missing or older than its
# source; this Makefile is the explicit, CI-friendly path).
#
#   make native     rebuild both shared libraries from source
#   make test       quick smoke tier (<2 min; excludes @slow tests)
#   make test-all   full suite
#   make clean      remove the built libraries

CXX      ?= c++
CXXFLAGS ?= -O3 -march=native -shared -fPIC -std=c++17

BVH_SO  = ppg_tpu/accel/native/libppgbvh.so
SDT_SO  = ppg_tpu/guiding/native/libppgsdt.so

.PHONY: native test test-all clean

native: $(BVH_SO) $(SDT_SO)

$(BVH_SO): ppg_tpu/accel/native/bvh_builder.cpp
	$(CXX) $(CXXFLAGS) -pthread $< -o $@

$(SDT_SO): ppg_tpu/guiding/native/sdtree_host.cpp
	$(CXX) $(CXXFLAGS) $< -o $@

# smoke tier: ~11 min of single-core call time (measured round 5,
# /tmp batched sweep); -n auto (pytest-xdist) brings it under ~3 min
# on an 8-core box. The full suite is ~77 min single-core — nightly.
test:
	python -m pytest tests/ -q -m "not slow" -n auto

test-all:
	python -m pytest tests/ -q

clean:
	rm -f $(BVH_SO) $(SDT_SO)
