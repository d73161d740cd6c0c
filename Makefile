.PHONY: all native test bench clean

all: native

native:
	$(MAKE) -C native
	g++ -O3 -fPIC -shared -std=c++17 -o native/libclm_bpe.so native/clm_bpe.cpp

test:
	python -m pytest tests/ -q

bench:
	python bench.py

clean:
	$(MAKE) -C native clean
	rm -f native/libclm_bpe.so
