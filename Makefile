.PHONY: test native bench toy-data clean

test:
	python -m pytest tests/ -x -q

native:
	./native/build.sh

bench:
	python bench.py

toy-data:
	python scripts/make_toy_dataset.py --output data_toy --num_images 64 --image_size 256
	python -m yolov3_tpu.data.builder --image_folder data_toy/images \
	  --csv_folder data_toy/csvs --output_folder data_toy/db \
	  --dataset_name toy --image_format png

clean:
	rm -rf native/build .pytest_cache
	find . -name __pycache__ -type d -exec rm -rf {} +
