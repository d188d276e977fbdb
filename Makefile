# Convenience targets (the reference's Makefile drives zig build; here:
# render / test / bench).

.PHONY: render test bench clean native

native:
	$(MAKE) -C native

render:
	python -m rtweekend_tpu.cli cornell_box -o out.png

test:
	python -m pytest tests/ -x -q

bench:
	python bench.py

clean:
	rm -f out.png out.ppm
