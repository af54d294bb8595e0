from fedcola_tpu.models.mat import MATConfig, init_mat, mat_apply  # noqa: F401
