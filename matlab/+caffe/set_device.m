function set_device(device_id)
% caffe.set_device(id) — recorded bridge-side for API parity; actual
% placement belongs to the JAX runtime on the daemon's host.
if ~(isscalar(device_id) && isnumeric(device_id) && device_id >= 0)
  error('caffe:set_device', 'device_id must be a non-negative integer');
end
caffe_('set_device', double(device_id));
end
