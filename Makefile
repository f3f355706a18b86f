.PHONY: test bench native clean

test:
	python -m pytest tests/ -q

bench:
	python bench.py

native: native/libfrogio.so native/baseline_frog native/baseline_match

native/libfrogio.so: native/frogio.cpp
	g++ -O3 -shared -fPIC -o $@ $< -lz

native/baseline_frog: native/baseline_frog.cpp
	g++ -O3 -march=native -fopenmp -o $@ $< -lm

native/baseline_match: native/baseline_match.cpp
	g++ -O3 -march=native -fopenmp -o $@ $< -lm

clean:
	rm -f native/libfrogio.so native/baseline_frog native/baseline_match
	find . -name __pycache__ -type d -exec rm -rf {} +
