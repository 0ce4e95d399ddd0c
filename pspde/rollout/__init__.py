from .sde import (HJBRolloutConfig, HJBRolloutOut, StoppedRolloutConfig,
                  StoppedRolloutOut, hjb_rollout, stopped_rollout)
