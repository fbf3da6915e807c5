.PHONY: test native bench verify-cli clean

test:
	python -m pytest tests/ -q

native:
	$(MAKE) -C native

bench:
	python bench.py

# full 7B on-device pipeline -> real packed checkpoint -> reload -> benchmark
quant7b:
	bash scripts/quant7b.sh

# hermetic end-to-end CLI workflow on CPU (see .claude/skills/verify)
verify-cli:
	env JAX_PLATFORMS=cpu PYTHONPATH=. python -m qeft_tpu.extract_outidx \
	    tiny synthetic --wbits 4 --target_rank 8 --groupsize 64 --no_frob_norm \
	    --nsamples 2 --seqlen 32 --output_dir /tmp/qeft_verify/oidx
	env JAX_PLATFORMS=cpu PYTHONPATH=. python -m qeft_tpu.main \
	    tiny synthetic --wbits 4 --target_rank 8 --groupsize 64 --no_frob_norm \
	    --nsamples 2 --seqlen 32 --reorder \
	    --outidx_file /tmp/qeft_verify/oidx/w4_r8/outidx.npy \
	    --packing --fake --save /tmp/qeft_verify/ckpt --eval --eval_windows 2
	env JAX_PLATFORMS=cpu PYTHONPATH=. python -m qeft_tpu.main \
	    tiny synthetic --load /tmp/qeft_verify/ckpt_packed --eval \
	    --eval_windows 2 --seqlen 32 --benchmark 8
	# same workflow for the OPT family (family rides the ckpt manifest)
	env JAX_PLATFORMS=cpu PYTHONPATH=. python -m qeft_tpu.extract_outidx \
	    opt-tiny synthetic --wbits 4 --target_rank 8 --groupsize 64 --no_frob_norm \
	    --nsamples 2 --seqlen 32 --output_dir /tmp/qeft_verify/oidx_opt
	env JAX_PLATFORMS=cpu PYTHONPATH=. python -m qeft_tpu.main \
	    opt-tiny synthetic --wbits 4 --target_rank 8 --groupsize 64 --no_frob_norm \
	    --nsamples 2 --seqlen 32 --reorder \
	    --outidx_file /tmp/qeft_verify/oidx_opt/w4_r8/outidx.npy \
	    --packing --save /tmp/qeft_verify/ckpt_opt --eval --eval_windows 2
	env JAX_PLATFORMS=cpu PYTHONPATH=. python -m qeft_tpu.main \
	    opt-tiny synthetic --load /tmp/qeft_verify/ckpt_opt_packed --eval \
	    --eval_windows 2 --seqlen 32 --benchmark 8
	# falcon: full OGR path (family-generic reorder; the parallel-residual
	# block permutes exactly — reference quantizes falcon with percdamp=1.0,
	# misc.py:132-136)
	env JAX_PLATFORMS=cpu PYTHONPATH=. python -m qeft_tpu.extract_outidx \
	    falcon-tiny synthetic --wbits 4 --target_rank 8 --groupsize 64 \
	    --no_frob_norm --nsamples 2 --seqlen 32 \
	    --output_dir /tmp/qeft_verify/oidx_falcon
	env JAX_PLATFORMS=cpu PYTHONPATH=. python -m qeft_tpu.main \
	    falcon-tiny synthetic --wbits 4 --target_rank 8 --groupsize 64 \
	    --no_frob_norm --nsamples 2 --seqlen 32 --reorder \
	    --outidx_file /tmp/qeft_verify/oidx_falcon/w4_r8/outidx.npy \
	    --packing --save /tmp/qeft_verify/ckpt_falcon --eval --eval_windows 2
	env JAX_PLATFORMS=cpu PYTHONPATH=. python -m qeft_tpu.main \
	    falcon-tiny synthetic --load /tmp/qeft_verify/ckpt_falcon_packed --eval \
	    --eval_windows 2 --seqlen 32 --benchmark 8

clean:
	rm -rf .pytest_cache __pycache__ native/libqeft_host.so
