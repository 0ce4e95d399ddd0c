from .pathspace import (HJB_LOSS_METHODS, cross_entropy_loss, hjb_loss,
                        log_variance_loss, log_variance_y0_losses,
                        moment_loss, relative_entropy_loss, variance_loss)
from .pinn import elliptic_pinn_residual, parabolic_pinn_residual
