function set_device(device_id)
CHECK(isscalar(device_id) && device_id >= 0, ...
      'device_id must be non-negative integer');
caffe_('set_device', double(device_id));
end
