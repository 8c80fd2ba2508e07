from .flow_matching import flow_matching_loss, make_optimizer, make_train_step, sample_discrete_timesteps

__all__ = ["flow_matching_loss", "make_optimizer", "sample_discrete_timesteps", "make_train_step"]
