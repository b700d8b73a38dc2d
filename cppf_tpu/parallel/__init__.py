from cppf_tpu.parallel.mesh import make_mesh, shard_batch_spec, sharded_ppf_vote  # noqa: F401
