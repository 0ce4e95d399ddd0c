from .importance_sampling import (do_importance_sampling,
                                  do_importance_sampling_me,
                                  importance_sampling)
